# Headless container for invesalius3_tpu (reference ships a Dockerfile for
# its headless build; this is the TPU-native equivalent).  The compute
# backend is whatever JAX platform the container sees: CPU by default, a
# TPU VM when run with the TPU runtime and `pip install jax[tpu]`.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY invesalius3_tpu ./invesalius3_tpu
COPY bench.py __graft_entry__.py ./

# CPU JAX by default; swap for jax[tpu] -f libtpu releases on a TPU VM
RUN pip install --no-cache-dir "jax[cpu]" flax optax pillow && \
    pip install --no-cache-dir -e .

EXPOSE 8080
# headless server + web viewer (reference: app.py --no-gui)
ENTRYPOINT ["python", "-m", "invesalius3_tpu.app"]
CMD ["--serve", "8080"]
