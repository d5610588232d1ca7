# dvbs2rx_tpu container image (reference analog: /root/reference/Dockerfile)
#
# CPU-only by default: jax[cpu] runs every receiver path (the Pallas LDPC
# kernel auto-falls back to the bit-identical XLA path off-TPU). For TPU
# hosts, build with --build-arg JAX_EXTRA="[tpu]" on a TPU VM base image.
FROM python:3.12-slim

ARG JAX_EXTRA=""

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/dvbs2rx_tpu
COPY pyproject.toml setup.py ./
COPY dvbs2rx_tpu ./dvbs2rx_tpu
COPY native ./native
COPY apps ./apps
COPY tools ./tools

RUN pip install --no-cache-dir "jax${JAX_EXTRA}" && \
    pip install --no-cache-dir -e . && \
    ln -s /opt/dvbs2rx_tpu/apps/dvbs2-rx /usr/local/bin/dvbs2-rx && \
    ln -s /opt/dvbs2rx_tpu/apps/dvbs2-tx /usr/local/bin/dvbs2-tx && \
    ln -s /opt/dvbs2rx_tpu/apps/dvbs2-rec /usr/local/bin/dvbs2-rec

# the de facto system test: cat ts | dvbs2-tx | dvbs2-rx
ENTRYPOINT ["dvbs2-rx"]
