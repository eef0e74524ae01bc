# Container packaging for the PySpark engine — parity with the
# reference's multi-stage image (/root/reference/Dockerfile:1-45),
# re-based for a JVM+PySpark runtime instead of a requests script.
#
# Build:  docker build -t ag-spark-engine:latest .
# Run:    docker run --rm ag-spark-engine:latest --test-mode --skip-upload
# Bench:  docker run --rm -v /data/sf0.1:/data/sf \
#             -e SPARK_GRAFT_SF_DIR=/data/sf \
#             --entrypoint python ag-spark-engine:latest /app/bench.py
#
# The image is self-contained for local[*] execution; for a real
# cluster, use the spark-submit recipe in README "Deployment" instead
# (the driver-side zip + --py-files path this image also exercises).

# --- stage 1: resolve Python dependencies into a clean site-packages ---
FROM python:3.12-slim AS builder

ENV PYTHONUNBUFFERED=1 \
    PYTHONDONTWRITEBYTECODE=1 \
    PIP_NO_CACHE_DIR=1 \
    PIP_DISABLE_PIP_VERSION_CHECK=1

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

# --- stage 2: runtime = slim Python + headless JRE 17 for the Spark JVM ---
FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    PYTHONDONTWRITEBYTECODE=1

# Spark needs a JVM; everything else ships via site-packages (pyspark
# wheels bundle the Spark jars).
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless procps \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

# Non-root user, same uid convention as the reference image.
RUN useradd -m -u 1000 appuser && \
    mkdir -p /app/cache /app/logs /app/warehouse && \
    chown -R appuser:appuser /app

WORKDIR /app

COPY --from=builder /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=builder /usr/local/bin /usr/local/bin

COPY --chown=appuser:appuser ag_data_ingestion_github_to_snowflake_spark/ /app/ag_data_ingestion_github_to_snowflake_spark/
COPY --chown=appuser:appuser __spark_entry__.py bench.py /app/

USER appuser

ENV PYTHONPATH=/app \
    SPARK_LOCAL_DIRS=/tmp \
    SPARK_GRAFT_CPUS=4

# Same contract as the reference entrypoint: the pipeline CLI with
# overridable flags (reference default: --use-cache).
ENTRYPOINT ["python", "-m", "ag_data_ingestion_github_to_snowflake_spark"]
CMD ["--test-mode", "--use-cache"]
