# TPU deployment image — analog of the reference's Dockerfile (which builds
# on nvcr.io/nvidia/pytorch). Target: a Cloud TPU VM (the host exposes
# /dev/accel* and vfio devices; run with docker-compose.yml or --privileged).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        zip htop screen g++ make libgl1 libglib2.0-0 libfreetype6-dev \
        libjpeg62-turbo-dev \
    && rm -rf /var/lib/apt/lists/*

RUN python -m pip install --upgrade pip

WORKDIR /usr/src/app
COPY . /usr/src/app

# jax[tpu] pulls libtpu from the Google release index; on a non-TPU host it
# falls back to CPU at runtime (JAX_PLATFORMS=cpu)
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e . \
    && pip install --no-cache-dir opencv-python-headless pyyaml

ENV HOME=/usr/src/app
ENV OMP_NUM_THREADS=1

# default command: the serving daemon; override for train.py / val.py etc.
CMD ["python", "serve.py", "--weights", "/models/best.ckpt.npz", \
     "--port", "8000", "--max-batch", "8", "--int8", "all"]
