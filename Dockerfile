# Magic Master TPU — service container.
# For TPU VMs use a jax[tpu]-enabled base; this image covers CPU/dev serving.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ sqlite3 curl \
        libavformat-dev libavcodec-dev libswresample-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/amw-tpu
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY amw_tpu ./amw_tpu
COPY frontend ./frontend
COPY scripts ./scripts
COPY deploy ./deploy
COPY tests ./tests
COPY bench.py ./

# Build the native codecs (PCM, FLAC, and the in-process lavc shim for
# MP3/OPUS/AAC — no ffmpeg CLI needed, only the libav dev packages above).
RUN python -m amw_tpu.native.build || true

# Codec round-trips (MP3/FLAC/OPUS/AAC) all run through the native shims —
# a codec regression fails the build.
RUN python -m pytest tests/test_codecs_ffmpeg.py -q

# Render the landing A/B demo clips with the chain itself (deterministic,
# not committed) and the regression fixture used by the QA harness.
RUN JAX_PLATFORMS=cpu python scripts/gen_demo_assets.py \
    && JAX_PLATFORMS=cpu python scripts/gen_regression_fixture.py

ENV AMW_DB_PATH=/data/amw_tpu.sqlite3
# Precompile the 180 s default chain at boot (first job hits the cache).
ENV AMW_ENGINE_WARMUP_BUCKETS=180
# Persistent XLA compilation cache: compiled graphs survive restarts, so a
# restarted container's warmup (and first job) loads from disk in seconds.
ENV AMW_COMPILATION_CACHE_DIR=/data/jax_cache
VOLUME /data
EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:8000/api/health || exit 1

CMD ["python", "-m", "amw_tpu.runtime.service"]
