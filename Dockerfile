# Container build (analogue of the reference's Dockerfile; adds a real test
# run where the reference image only installs).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /f1tenth_gym_tpu
COPY . .

RUN pip install --no-cache-dir -e ".[full,test]"
RUN bash f1tenth_gym_tpu/native/build.sh || true

# default: run the suite on a virtual 8-device CPU mesh
ENV JAX_PLATFORMS=cpu
CMD ["python", "-m", "pytest", "tests/", "-q"]
