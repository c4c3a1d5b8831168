# Container packaging for the engine + interactive dashboard server
# (parity with the reference's Dockerfile, which serves its
# Streamlit app on 8501 — /root/reference/Dockerfile:1; here the
# served app is pipelines/dashboard_server.py over a parquet
# volume).
#
#   docker build -t marketviz-spark .
#   docker run -p 8501:8501 -v /path/to/tables:/data marketviz-spark
#
# No network access is needed at runtime: the server reads only the
# parquet tables mounted at /data (stocks.parquet, index_data.parquet
# as produced by the ingest/upsert pipelines), and the XLSX/PDF
# download routes use the stdlib writers baked into the image.
FROM python:3.11-slim

# PySpark bundles Spark itself but needs a JVM.
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY marketviz_spark/ marketviz_spark/

# Bind beyond loopback so the published port works; size the local
# Spark master from the container's CPU allotment at run time via
# -e SPARK_GRAFT_CPUS=N (defaults to 4 here, not the dev-box 32).
ENV MARKETVIZ_HOST=0.0.0.0 \
    SPARK_GRAFT_CPUS=4 \
    PYTHONUNBUFFERED=1

EXPOSE 8501

CMD ["python", "-m", "marketviz_spark.pipelines.dashboard_server", "/data", "8501"]
