"""Pascal VOC download + conversion to the training layout.

Behavioral parity target: data/scripts/voc.py (download VOC2007/2012, convert
XML annotations to normalized txt labels under images/ | labels/ siblings).
Requires network access when run; conversion helpers are usable offline.
"""

from __future__ import annotations

import argparse
import xml.etree.ElementTree as ET
from pathlib import Path

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

URLS = {
    "VOCtrainval_06-Nov-2007": "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",
    "VOCtest_06-Nov-2007": "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar",
    "VOCtrainval_11-May-2012": "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",
}


def convert_box(size, box):
    """VOC xyxy -> normalized xywh."""
    dw, dh = 1.0 / size[0], 1.0 / size[1]
    x = (box[0] + box[1]) / 2.0 - 1
    y = (box[2] + box[3]) / 2.0 - 1
    w = box[1] - box[0]
    h = box[3] - box[2]
    return x * dw, y * dh, w * dw, h * dh


def convert_annotation(xml_path: Path, out_path: Path) -> int:
    """One VOC XML -> txt label file. Returns number of boxes written."""
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    lines = []
    for obj in root.iter("object"):
        cls = obj.find("name").text
        difficult = obj.find("difficult")
        if cls not in VOC_CLASSES or (difficult is not None and difficult.text == "1"):
            continue
        xb = obj.find("bndbox")
        b = [float(xb.find(t).text) for t in ("xmin", "xmax", "ymin", "ymax")]
        bb = convert_box((w, h), b)
        lines.append(f"{VOC_CLASSES.index(cls)} " + " ".join(f"{v:.6f}" for v in bb))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text("\n".join(lines))
    return len(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="datasets/VOC")
    opt = p.parse_args(argv)
    import tarfile
    import urllib.request

    root = Path(opt.dir)
    root.mkdir(parents=True, exist_ok=True)
    for name, url in URLS.items():
        tar = root / f"{name}.tar"
        if not tar.exists():
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, tar)
        with tarfile.open(tar) as t:
            t.extractall(root)
    # convert
    for year, split in (("2012", "train"), ("2012", "val"), ("2007", "train"),
                        ("2007", "val"), ("2007", "test")):
        devkit = root / "VOCdevkit" / f"VOC{year}"
        ids = (devkit / "ImageSets" / "Main" / f"{split}.txt").read_text().split()
        img_dir = root / "images" / (f"test{year}" if split == "test" else "train_all")
        lb_dir = root / "labels" / img_dir.name
        img_dir.mkdir(parents=True, exist_ok=True)
        for iid in ids:
            src = devkit / "JPEGImages" / f"{iid}.jpg"
            (img_dir / src.name).symlink_to(src.resolve())
            convert_annotation(devkit / "Annotations" / f"{iid}.xml",
                               lb_dir / f"{iid}.txt")
        print(f"VOC{year}/{split}: {len(ids)} images")


if __name__ == "__main__":
    main()
