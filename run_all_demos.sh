#!/bin/bash
# Twin of reference run_all_demos.sh: the editing-demo scenes.  The book scene
# needs the extra init points (ADD_BOOK_INIT_PTS, see scene/init.py) and skips
# eval exactly like the reference (SKIP_EVAL=1).
set -e
DATA=${DATA:-data/demos}
OUT=${OUT:-output/demos}
SKIP_EVAL=1 ADD_BOOK_INIT_PTS=1 ./run.sh "$DATA/shiny_office_with_book" "$OUT/shiny_office_with_book" "$@"
for SCENE in multichromeball multichromeball_identical multichromeball_tint; do
  ./run.sh "$DATA/$SCENE" "$OUT/$SCENE" "$@"
done
