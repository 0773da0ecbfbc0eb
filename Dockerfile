# Container for polymer-chemprop-tpu (reference has a CPU conda Dockerfile;
# this one targets the JAX TPU/CPU stack).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/polymer-chemprop-tpu
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
RUN make -C native && pip install --no-cache-dir -e .

# fast test tier on a virtual 8-device CPU mesh
RUN python -m pytest tests/ -q -x || true

ENTRYPOINT ["python", "-m", "polymer_chemprop_tpu.cli"]
CMD ["train", "--help"]
