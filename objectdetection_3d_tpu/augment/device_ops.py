"""On-device, jittable train-time augmentation.

The reference augments on the host inside forked dataloader workers
(augment/augmentation.py, only PointShuffle active).  Here the geometric
augmentations run inside the jitted train step on the padded batch, so the
input pipeline never throttles the chip (BASELINE north-star).  Ground-truth
boxes are transformed consistently with the points.

All transforms are per-item (independent PRNG per cloud) and preserve the
scene range by rotating/flipping about the range center.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _split_per_item(key, batch_size, n):
    keys = jax.random.split(key, batch_size * n)
    return keys.reshape(batch_size, n, -1)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(batch, key, cfg):
    """Apply configured augmentations to a padded device batch.

    Args:
        batch: dict with 'points' (B, P, C), 'num_points' (B,),
            'bboxes' (B, G, 9), 'gt_mask' (B, G), ...
        key: jax PRNG key.
        cfg: hashable tuple of (name, *params) entries, e.g.
            (("rotate", 0.0, 6.2831853), ("scale", 0.95, 1.05),
             ("flip_x",), ("flip_y",), ("translate", 0.5)).
    Returns:
        augmented batch dict (same shapes).
    """
    points = batch["points"]
    boxes = batch["bboxes"]
    b = points.shape[0]
    center = (jnp.max(points[..., :2], axis=1, keepdims=True)
              + jnp.min(points[..., :2], axis=1, keepdims=True)) / 2

    keys = _split_per_item(key, b, max(len(cfg), 1))

    for i, entry in enumerate(cfg):
        name = entry[0]
        k = keys[:, i]
        if name == "rotate":
            lo, hi = entry[1], entry[2]
            theta = jax.random.uniform(k[0], (b,), minval=lo, maxval=hi)
            cos, sin = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
            px = points[..., 0] - center[..., 0]
            py = points[..., 1] - center[..., 1]
            points = points.at[..., 0].set(
                cos * px - sin * py + center[..., 0])
            points = points.at[..., 1].set(
                sin * px + cos * py + center[..., 1])
            bx = boxes[..., 0] - center[..., 0]
            by = boxes[..., 1] - center[..., 1]
            boxes = boxes.at[..., 0].set(
                cos * bx - sin * by + center[..., 0])
            boxes = boxes.at[..., 1].set(
                sin * bx + cos * by + center[..., 1])
            boxes = boxes.at[..., 8].add(theta[:, None])
        elif name == "scale":
            lo, hi = entry[1], entry[2]
            s = jax.random.uniform(k[0], (b, 1), minval=lo, maxval=hi)
            points = points.at[..., :3].multiply(s[..., None])
            boxes = boxes.at[..., :6].multiply(s[..., None])
        elif name == "flip_x":
            do = jax.random.bernoulli(k[0], 0.5, (b, 1))
            fx = 2 * center[..., 0]
            points = points.at[..., 0].set(
                jnp.where(do, fx - points[..., 0], points[..., 0]))
            boxes = boxes.at[..., 0].set(
                jnp.where(do, 2 * center[:, :1, 0] - boxes[..., 0],
                          boxes[..., 0]))
            # mirror about x: rz -> pi - rz, ry -> -ry
            boxes = boxes.at[..., 8].set(
                jnp.where(do, jnp.pi - boxes[..., 8], boxes[..., 8]))
            boxes = boxes.at[..., 7].set(
                jnp.where(do, -boxes[..., 7], boxes[..., 7]))
        elif name == "flip_y":
            do = jax.random.bernoulli(k[0], 0.5, (b, 1))
            points = points.at[..., 1].set(
                jnp.where(do, 2 * center[..., 1] - points[..., 1],
                          points[..., 1]))
            boxes = boxes.at[..., 1].set(
                jnp.where(do, 2 * center[:, :1, 1] - boxes[..., 1],
                          boxes[..., 1]))
            # mirror about y: rz -> -rz, rx -> -rx
            boxes = boxes.at[..., 8].set(
                jnp.where(do, -boxes[..., 8], boxes[..., 8]))
            boxes = boxes.at[..., 6].set(
                jnp.where(do, -boxes[..., 6], boxes[..., 6]))
        elif name == "translate":
            std = entry[1]
            t = jax.random.normal(k[0], (b, 1, 3)) * std
            points = points.at[..., :3].add(t)
            boxes = boxes.at[..., :3].add(t)
        elif name == "noise":
            std = entry[1]
            points = points.at[..., :3].add(
                jax.random.normal(k[0], points[..., :3].shape) * std)
        else:
            raise ValueError(f"Unknown device augmentation: {name}")

    # zero out padding rows again (transforms touched them harmlessly)
    p_mask = (jnp.arange(points.shape[1])[None, :]
              < batch["num_points"][:, None])
    points = points * p_mask[..., None].astype(points.dtype)
    boxes = boxes * batch["gt_mask"][..., None].astype(boxes.dtype)

    out = dict(batch)
    out["points"] = points
    out["bboxes"] = boxes
    return out


def parse_device_augment_cfg(cfg_dict):
    """Config dict -> hashable cfg tuple for :func:`augment_batch`.

    Accepted keys: rotate {min,max} (radians), scale {min,max},
    flip_x / flip_y (bool), translate {std}, noise {std}.
    """
    out = []
    cfg_dict = dict(cfg_dict or {})
    if "rotate" in cfg_dict:
        r = cfg_dict["rotate"] or {}
        out.append(("rotate", float(r.get("min", 0.0)),
                    float(r.get("max", 2 * 3.14159265))))
    if "scale" in cfg_dict:
        s = cfg_dict["scale"] or {}
        out.append(("scale", float(s.get("min", 0.95)),
                    float(s.get("max", 1.05))))
    if cfg_dict.get("flip_x"):
        out.append(("flip_x",))
    if cfg_dict.get("flip_y"):
        out.append(("flip_y",))
    if "translate" in cfg_dict:
        t = cfg_dict["translate"] or {}
        out.append(("translate", float(t.get("std", 0.5))))
    if "noise" in cfg_dict:
        n = cfg_dict["noise"] or {}
        out.append(("noise", float(n.get("std", 0.001))))
    return tuple(out)
