#!/bin/sh
# Build the serving image (analog of the reference's build.sh).
set -e
cd "$(dirname "$0")"
docker build -t deepdish-tpu .
echo "run: docker run --privileged --net=host deepdish-tpu --help"
