#!/bin/bash
# Twin of reference render_novel_views.sh: spiral-path renders + per-pass MP4s.
# Videos go through ffmpeg when present (same encode settings as the
# reference), otherwise render_novel_views.py's imageio fallback writes them.
set -e
MODEL=$1
shift
python tools/render_novel_views.py -m "$MODEL" "$@"

ITER_DIR=$(ls -d "$MODEL"/novel_views/ours_* 2>/dev/null | sort -V | tail -1)
if command -v ffmpeg >/dev/null 2>&1 && [ -n "$ITER_DIR" ]; then
  for PASS in diffuse specular render normal depth; do
    [ -d "$ITER_DIR/$PASS" ] || continue
    NAME=$PASS
    [ "$PASS" = specular ] && NAME=glossy
    ffmpeg -y -framerate 30 -pattern_type glob -i "$ITER_DIR/$PASS/*.png" \
      -c:v libx264 -vf "pad=ceil(iw/2)*2:ceil(ih/2)*2" -pix_fmt yuv420p \
      "$MODEL/novel_views/$NAME.mp4"
  done
fi
