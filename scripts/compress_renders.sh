#!/bin/bash
# Twin of reference scripts/compress_renders.sh: quantize the GT renders into
# data/renders_compressed (float buffers -> 16-bit TIFF) and carry the
# transforms/sparse metadata along (compress_dataset.py copies them through).
set -xe
export OPENCV_IO_ENABLE_OPENEXR=1
python tools/compress_dataset.py --input_dir "${1:-data/renders}" \
  --output_dir "${2:-data/renders_compressed}"
