from cerberusdet_tpu.infer.preprocessor import CerberusPreprocessor  # noqa: F401
from cerberusdet_tpu.infer.inference import CerberusDetInference  # noqa: F401
from cerberusdet_tpu.infer.visualizer import CerberusVisualizer  # noqa: F401
