# Dev container parity with the reference (reference: Dockerfile idles a Go
# toolchain; docker-compose mounts the source). Here: a Python+JAX CPU image
# for development and CI; on a TPU VM, install the matching libtpu jax extra.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
RUN pip install --no-cache-dir "jax[cpu]" flax numpy ml_dtypes regex \
    pytest torch tiktoken --extra-index-url https://download.pytorch.org/whl/cpu

COPY . .
RUN bash scripts/build.sh

ENV JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8

ENTRYPOINT ["bash", "entrypoint.sh"]
