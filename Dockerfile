# deepdish-tpu serving image — the analog of the reference's Dockerfile
# (/root/reference/Dockerfile builds a GPU TF image; this builds the
# TPU-native JAX stack). Build on a Cloud TPU VM (v5e) or any host for the
# CPU backend:
#
#   docker build -t deepdish-tpu .
#   docker run --privileged --net=host deepdish-tpu \
#       deepdish-tpu --input video.mp4 --model detectors/detect.tflite \
#       --encoder-model encoders/mars-little128.tflite --log /data/out.log
#
# --privileged/--net=host expose the TPU devices the way Cloud TPU VM
# docs prescribe; on a CPU-only host add `--device cpu` to the CLI flags.
FROM python:3.12-slim

ENV DEBIAN_FRONTEND=noninteractive
# ffmpeg: cv2 video decode; libgl/glib: opencv runtime; libopencv-dev +
# g++/make: the native C++ frame loader (native/Makefile); fonts:
# rendering (the reference image installs the same classes of system deps)
RUN apt-get update -y && apt-get install -y --no-install-recommends \
        ffmpeg libgl1 libglib2.0-0 fonts-freefont-ttf g++ make \
        libopencv-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/deepdish-tpu
COPY requirements.txt .
# TPU wheel index for libtpu; harmless on non-TPU hosts
RUN pip install --no-cache-dir -r requirements.txt \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml README.md ./
COPY deepdish_tpu ./deepdish_tpu
COPY native ./native
RUN pip install --no-cache-dir . && make -C native \
    || echo "native loader build skipped; the pipeline falls back to \
cv2 decode (utils/native.py rebuilds lazily when headers appear)"

# MJPEG web stream (reference serves on :8080)
EXPOSE 8080

ENTRYPOINT ["deepdish-tpu"]
CMD ["--help"]
