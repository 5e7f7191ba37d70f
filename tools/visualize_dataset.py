#!/usr/bin/env python
"""Dataset visual self-test (the ref yolo_v1/dataset.py:126-166 __main__
analogue, non-interactive): encode each image's labels to the SxS grid,
decode + NMS them back, and write tagged / grid-tagged images — the
round-trip that visually validates the label encoder.

Usage:
  python tools/visualize_dataset.py --data-dir data/ --names data/test.names \
      --out-dir /tmp/viz [--augment]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--names", required=True)
    p.add_argument("--out-dir", default="viz_out")
    p.add_argument("--image-size", type=int, default=448)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--limit", type=int, default=16)
    p.add_argument("--letterbox", action="store_true",
                   help="decode with the aspect-preserving letterbox path "
                        "(match a letterbox-trained config)")
    p.add_argument("--augment", action="store_true",
                   help="run the train-time on-device augmentation first")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from keras_object_detection_tpu.core.grid import decode_grid, encode_grid
    from keras_object_detection_tpu.data.augment import augment_batch
    from keras_object_detection_tpu.data.reader import list_examples, load_example
    from keras_object_detection_tpu.ops.nms import non_max_suppression
    from keras_object_detection_tpu.utils.viz import (
        get_grid_tagged_img, get_tagged_img)

    os.makedirs(args.out_dir, exist_ok=True)
    paths = list_examples(args.data_dir)[: args.limit]
    for n, path in enumerate(paths):
        img, boxes, valid = load_example(path, args.image_size, 64,
                                         letterbox=args.letterbox)
        if args.augment:
            aimg, aboxes, avalid = augment_batch(
                jnp.asarray(img[None]), jnp.asarray(boxes[None]),
                jnp.asarray(valid[None]), jax.random.PRNGKey(n))
            img = (np.asarray(aimg[0]) * 255).astype(np.uint8)
            boxes, valid = np.asarray(aboxes[0]), np.asarray(avalid[0])
        grid = encode_grid(jnp.asarray(boxes), jnp.asarray(valid),
                           args.num_classes)
        decoded = decode_grid(grid[None], args.num_classes)[0]
        kept, kvalid = non_max_suppression(decoded)
        kept = np.asarray(kept)[np.asarray(kvalid)]

        base = os.path.splitext(os.path.basename(path))[0]
        tagged = get_tagged_img(img.copy(), kept, args.names)
        gridded = get_grid_tagged_img(img.copy(), kept, args.names)
        try:
            import cv2

            cv2.imwrite(os.path.join(args.out_dir, f"{base}_tagged.jpg"),
                        cv2.cvtColor(tagged, cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(args.out_dir, f"{base}_grid.jpg"),
                        cv2.cvtColor(gridded, cv2.COLOR_RGB2BGR))
        except ImportError:
            from PIL import Image

            Image.fromarray(tagged).save(
                os.path.join(args.out_dir, f"{base}_tagged.jpg"))
            Image.fromarray(gridded).save(
                os.path.join(args.out_dir, f"{base}_grid.jpg"))
        print(f"{base}: {len(kept)} boxes round-tripped")
    print(f"wrote {2 * len(paths)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
