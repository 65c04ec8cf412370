#!/bin/bash
# Twin of reference scripts/test.sh.
OPENCV_IO_ENABLE_OPENEXR=1 python -m pytest -s tests/
