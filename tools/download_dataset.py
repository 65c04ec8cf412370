"""Dataset fetch - twin of reference tools/download_dataset.py.

Downloads the shiny synthetic scenes / Neural Catacaustics captures /
pretrained models from the project mirrors into data/.  Requires network
access (unavailable in air-gapped environments - the CLI then prints the
expected layout so data can be staged manually).
"""

from __future__ import annotations

import argparse
import os
import urllib.error
import urllib.request

SCENES = {
    "shiny_kitchen": "renders", "shiny_office": "renders",
    "shiny_livingroom": "renders", "shiny_bedroom": "renders",
    "bear": "catacaustics", "multibounce": "catacaustics",
}
BASE_URL = os.environ.get(
    "EGR_DATASET_BASE_URL",
    "https://repo-sam.inria.fr/fungraph/editable-gaussian-reflections/datasets",
)

EXPECTED_LAYOUT = """expected layout per scene (see dataset/ docstrings):
data/renders/<scene>/
  transforms_train.json  transforms_test.json  bounding_boxes.json
  <split>_render_####.{exr|tiff|png}  (+ diffuse/specular/roughness/normal/depth/f0)
  point_cloud_dense.ply  (from prepare_initial_ply.py)
data/catacaustics/<scene>/
  sparse/0/{cameras,images,points3D}.bin   priors/<buffer>/<buffer>_####.png
"""


def main(argv=None):
    p = argparse.ArgumentParser(prog="download_dataset", allow_abbrev=False)
    p.add_argument("--scenes", nargs="*", default=list(SCENES))
    p.add_argument("--out", default="data")
    args = p.parse_args(argv)

    for scene in args.scenes:
        group = SCENES.get(scene, "renders")
        url = f"{BASE_URL}/{scene}.zip"
        dst = os.path.join(args.out, group, f"{scene}.zip")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        print(f"fetching {url} ...")
        try:
            urllib.request.urlretrieve(url, dst)
            import zipfile
            with zipfile.ZipFile(dst) as z:
                z.extractall(os.path.dirname(dst))
            os.remove(dst)
            print(f"  -> {os.path.dirname(dst)}/{scene}")
        except (urllib.error.URLError, OSError) as e:
            print(f"  download failed ({e}); stage the data manually.")
            print(EXPECTED_LAYOUT)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
