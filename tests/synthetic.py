"""Synthetic COCO-format dataset helpers shared by data/eval tests."""

import json
import os

import numpy as np


def make_coco_json(tmpdir, num_images=4, num_cats=3, seed=0, img_hw=(120, 160),
                   slender=False):
    """Create a tiny COCO instances json + matching .npy-backed image files.
    Returns (json_path, image_root, dataset_dicts_like)."""
    rng = np.random.RandomState(seed)
    h, w = img_hw
    images, annotations, categories = [], [], []
    # deliberately non-contiguous category ids (like real COCO)
    cat_ids = [3 * i + 1 for i in range(num_cats)]
    for i, cid in enumerate(cat_ids):
        categories.append({"id": cid, "name": f"cat{i}", "supercategory": "obj"})

    # objects are VISIBLE: each category has a distinct solid color drawn on a
    # dark noisy background, so a detector can actually learn localization
    colors = {cid: tuple(int(c) for c in rng.randint(140, 255, 3))
              for cid in cat_ids}

    image_root = os.path.join(str(tmpdir), "images")
    os.makedirs(image_root, exist_ok=True)
    ann_id = 1
    for img_id in range(1, num_images + 1):
        file_name = f"{img_id:06d}.png"
        images.append(
            {"id": img_id, "file_name": file_name, "height": h, "width": w}
        )
        import cv2

        img = rng.randint(0, 40, (h, w, 3)).astype(np.uint8)

        for _ in range(rng.randint(1, 4)):
            if slender and rng.rand() < 0.5:
                bw, bh = rng.randint(40, 60), rng.randint(4, 7)  # slender
            else:
                bw, bh = rng.randint(20, 50), rng.randint(20, 50)
            x = rng.randint(0, w - bw)
            y = rng.randint(0, h - bh)
            cid = int(rng.choice(cat_ids))
            cv2.rectangle(img, (x, y), (x + bw - 1, y + bh - 1),
                          colors[cid], thickness=-1)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cid,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                    "segmentation": [
                        [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
                    ],
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(image_root, file_name), img)

    json_path = os.path.join(str(tmpdir), "instances.json")
    with open(json_path, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": categories}, f
        )
    return json_path, image_root
