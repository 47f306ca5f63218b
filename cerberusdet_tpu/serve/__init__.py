from cerberusdet_tpu.serve.server import BatchingEngine, make_server  # noqa: F401
