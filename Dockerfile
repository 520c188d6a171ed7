# Container packaging for acmmp-tpu (the reference ships CUDA Dockerfiles,
# docker/Dockerfile-base + docker/Dockerfile; here the image is a plain
# Python environment — the TPU runtime comes from the host's libtpu).
#
#   docker build -t acmmp-tpu .
#   docker run --privileged -v /path/to/scenes:/data acmmp-tpu \
#       reconstruct /data/scene1

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libgomp1 && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/acmmp-tpu
COPY pyproject.toml README.md ./
COPY acmmp_tpu ./acmmp_tpu

# jax[tpu] resolves libtpu on TPU VMs; on CPU-only hosts plain jax is used
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir numpy pillow scipy matplotlib opencv-python-headless \
    && pip install --no-cache-dir -e .

ENTRYPOINT ["acmmp-tpu"]
CMD ["--help"]
