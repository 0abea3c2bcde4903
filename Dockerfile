# Scheduled-job container for the PySpark engine — the deploy unit the
# reference packages as a Lambda image (/root/reference/Dockerfile:1
# FROM public.ecr.aws/lambda/nodejs:24, CMD dist/task.handler). Here
# the handler is the tested CLI surface `python -m etl_wlg_metlink_spark
# --schedule`: one container invocation = one availableNow streaming
# run over the landing dir — process every landed GTFS-RT snapshot,
# submit one FeatureCollection per micro-batch, exit. With the stable
# /data/checkpoint volume the run is exactly-once across invocations
# (a cron / EventBridge / k8s CronJob re-running the same command skips
# already-processed files).
#
# Build:    docker build -t etl-wlg-metlink-spark .
# Run:      docker run -v $PWD/landing:/data/landing \
#                      -v $PWD/ckpt:/data/checkpoint \
#                      -v $PWD/metlink.json:/etc/metlink/config.json:ro \
#                      etl-wlg-metlink-spark
# Override: any tested CLI flags may replace the default CMD, e.g.
#           docker run ... etl-wlg-metlink-spark \
#               --schedule /data/landing --checkpoint /data/checkpoint \
#               --config /etc/metlink/config.json
#
# Single-container local[*] is the deploy shape this unit targets (the
# reference's one-Lambda-per-tick); against a real cluster submit the
# same module via spark-submit instead:
#   spark-submit --master <cluster> <site-packages>/etl_wlg_metlink_spark/__main__.py ...

FROM python:3.11-slim

# Spark driver needs a JVM; headless JRE 17 matches the tested runtime.
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir pyspark==4.1.2 pandas pyarrow numpy

WORKDIR /app
COPY etl_wlg_metlink_spark/ etl_wlg_metlink_spark/

# Mirrors the reference's CMD ["dist/task.handler"]: ENTRYPOINT is the
# module, CMD the default scheduled invocation (both overridable).
ENTRYPOINT ["python", "-m", "etl_wlg_metlink_spark"]
CMD ["--schedule", "/data/landing", "--checkpoint", "/data/checkpoint"]
