# odtk-tpu container (E8 parity: reference Dockerfile).
# Base: a JAX TPU image (provides libtpu + jax[tpu]).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ cmake ninja-build libjpeg-dev libopencv-dev && \
    rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir flax optax numpy Pillow tensorboardX opencv-python-headless

COPY . /workspace/odtk-tpu
WORKDIR /workspace/odtk-tpu
RUN pip install --no-cache-dir -e . && \
    cmake -B native/build -G Ninja native && ninja -C native/build

ENTRYPOINT ["odtk-tpu"]
