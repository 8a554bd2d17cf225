"""Ground-truth object database for the ObjectSample augmentation.

The reference names ``ObjectSample`` in its augmentor
(augment/augmentation.py:145,182) and ships the support ops
(ops/ops_torch.py:466-533) but never wires the augmentation itself; this
module completes the pipeline: crop every GT object's interior points
across the training split into a database file, then paste
collision-checked samples into scenes at train time (see
``ObjdetAugmentation.ObjectSample``).

Database file: a pickle of ``{label: [entry, ...]}`` where each entry is
``{"bbox": (9,) float32, "label": int, "name": str,
"points_inside_box": (P_i, C) float32}`` — the dict shape
``ops.sampling.filter_by_min_points`` / ``sample_class`` consume.
"""

import pickle

import numpy as np

from objectdetection_3d_tpu.ops.boxes import points_in_boxes


def crop_gt_objects(points, bboxes, labels, name=""):
    """Per-box interior point crops of one cloud -> list of DB entries."""
    import jax.numpy as jnp

    points = np.asarray(points, np.float32)
    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 9)
    labels = np.asarray(labels).reshape(-1)
    if len(bboxes) == 0:
        return []
    inside = np.asarray(points_in_boxes(jnp.asarray(points[:, :3]),
                                        jnp.asarray(bboxes)))
    return [{
        "bbox": bboxes[i],
        "label": int(labels[i]) if i < len(labels) else 0,
        "name": name,
        "points_inside_box": points[inside[:, i]],
    } for i in range(len(bboxes))]


def build_gt_database(split, out_path, min_points=1, log=print):
    """Crop every GT object of a dataset split into ``out_path``.

    Args:
        split: dataset split with ``__len__``/``get_data``/``get_attr``
            (e.g. ``Forest3D(...).get_split("training")``).
        out_path: destination ``.pkl``.
        min_points: skip objects with fewer interior points.
    Returns:
        the database dict.
    """
    db = {}
    for idx in range(len(split)):
        data = split.get_data(idx)
        attr = split.get_attr(idx)
        entries = crop_gt_objects(data["point"], data["bboxes"],
                                  data.get("labels", []),
                                  name=attr.get("name", str(idx)))
        kept = 0
        for e in entries:
            if e["points_inside_box"].shape[0] >= min_points:
                db.setdefault(e["label"], []).append(e)
                kept += 1
        log(f"gt_database: {attr.get('name', idx)}: kept {kept}/"
            f"{len(entries)} objects")
    with open(out_path, "wb") as f:
        pickle.dump(db, f, protocol=pickle.HIGHEST_PROTOCOL)
    log(f"gt_database: wrote {sum(len(v) for v in db.values())} objects "
        f"({len(db)} classes) to {out_path}")
    return db


def load_gt_database(path):
    with open(path, "rb") as f:
        return pickle.load(f)
