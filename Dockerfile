# vision-spectra-tpu container (mirrors the reference's Docker packaging).
# For TPU hosts, base on a jax[tpu]-provisioned image instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY vision_spectra_tpu ./vision_spectra_tpu
COPY bin ./bin
COPY configs ./configs

RUN pip install --no-cache-dir -e . \
    && make -C vision_spectra_tpu/native

ENTRYPOINT ["vision-spectra"]
CMD ["--help"]
