#!/bin/bash
# Twin of reference download_all_datasets.sh.  Fetches the published dataset
# archives (requires network egress; on air-gapped TPU hosts use the
# synthetic-room generator tools/make_room_dataset.py instead).
set -e
echo "Downloading all datasets to data/ ..."
mkdir -p data

BASE=https://repo-sam.inria.fr/nerphys/editable-gaussian-reflections/datasets
for NAME in renders renders_priors neural_catacaustics demos; do
  (wget "$BASE/$NAME.zip" -O "data/$NAME.zip" &&
   python -m zipfile -e "data/$NAME.zip" data/ && rm "data/$NAME.zip") &
done
wait

echo "All datasets downloaded and extracted to data/."
