# AVEDE-TPU serving image.
#
# Role model: reference Dockerfile (python-slim + ffmpeg/libGL). This
# image targets TPU VMs: the JAX TPU wheel is installed at build; the
# REST API (aiohttp) is the entry point, with the supervisor in front.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg libgl1 libglib2.0-0 g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY avede_tpu ./avede_tpu
COPY robust_server.py bench.py ./

# TPU wheel on TPU VMs; CPU jax elsewhere (override JAX_INDEX at build)
ARG JAX_VARIANT=jax[tpu]
RUN pip install --no-cache-dir \
        "${JAX_VARIANT}" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint einops pydantic aiohttp \
        opencv-python-headless numpy psutil \
    && pip install --no-cache-dir -e . \
    && python -m avede_tpu.native.build

EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=10s --start-period=120s \
    CMD python -c "import urllib.request; \
        urllib.request.urlopen('http://localhost:8000/api/health')"

CMD ["python", "robust_server.py", "--port", "8000"]
