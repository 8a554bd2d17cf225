"""Tiny model configuration shared by model-level tests."""

import numpy as np


def tiny_model_cfg():
    """A miniature PointPillars config: 16x16x4 grid, 4 anchors/cell."""
    return dict(
        name="PointPillars",
        device="cpu",
        classes=["Tree"],
        input_features=[0, 1, 2, 3],
        point_cloud_range=[0.0, 0.0, 0.0, 8.0, 8.0, 4.0],
        voxelize=dict(max_voxel_points=8,
                      voxel_size=[0.5, 0.5, 1.0],
                      max_voxels=256),
        voxel_encoder=dict(in_channels=4, feat_channels=[16],
                           voxel_size=[0.5, 0.5, 1.0]),
        vertical_encoder=dict(in_channels=16, out_channels=[16]),
        backbone=dict(in_channels=16, out_channels=[16, 16],
                      layer_nums=[1, 1], layer_strides=[1, 1]),
        neck=dict(),
        head=dict(in_channels=16, nms_pre=64, nms_thresh=1e-5,
                  score_thr=0.3,
                  ranges=[[0.0, 0.0, 0.0, 8.0, 8.0, 4.0]],
                  sizes=[[0.6, 0.6, 2.0], [1.0, 1.0, 3.0]],
                  rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
                  iou_thr=[[0.08, 0.2]],
                  box_params_num=9, nms_dim=3),
        loss=dict(focal=dict(gamma=2.0, alpha=0.25, loss_weight=1.0),
                  smooth_l1=dict(beta=0.11, loss_weight=2.0),
                  cross_entropy=dict(loss_weight=0.2)),
        augment=dict(PointShuffle=True),
        tpu=dict(max_points_static=2048, max_voxels_static=256,
                 max_gt_static=8, assign_candidates_per_gt=64,
                 max_detections=32, compute_dtype="float32"),
        seed=0,
    )


def tiny_batch(batch_size=2, num_gt=3, seed=0, max_points=2048, max_gt=8):
    """Synthetic padded device batch with clustered points around GT boxes."""
    rng = np.random.default_rng(seed)
    points = np.zeros((batch_size, max_points, 4), np.float32)
    n_points = np.zeros((batch_size,), np.int32)
    boxes = np.zeros((batch_size, max_gt, 9), np.float32)
    labels = np.zeros((batch_size, max_gt), np.int32)
    gt_mask = np.zeros((batch_size, max_gt), bool)

    for b in range(batch_size):
        pts = []
        centers = []
        for g in range(num_gt):
            # enforce separation: two coincident trees are one NMS
            # cluster by design, which makes recall targets unreachable
            for _ in range(100):
                cx, cy = rng.uniform(1.5, 6.5, 2)
                if all(np.hypot(cx - x, cy - y) > 1.6 for x, y in centers):
                    break
            centers.append((cx, cy))
            box = [cx, cy, 0.2, 0.8, 0.8, 2.5,
                   rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                   rng.uniform(-np.pi, np.pi)]
            boxes[b, g] = box
            gt_mask[b, g] = True
            k = 150
            local = rng.uniform([-0.3, -0.3, 0.1], [0.3, 0.3, 2.2], (k, 3))
            cloud = local + [cx, cy, 0.2]
            refl = rng.uniform(0, 1, (k, 1))
            pts.append(np.concatenate([cloud, refl], -1))
        noise = np.concatenate(
            [rng.uniform([0, 0, 0], [8, 8, 3.5], (300, 3)),
             rng.uniform(0, 1, (300, 1))], -1)
        pts.append(noise)
        cloud = np.concatenate(pts, 0).astype(np.float32)
        n = min(len(cloud), max_points)
        points[b, :n] = cloud[:n]
        n_points[b] = n

    return {
        "points": points,
        "num_points": n_points,
        "bboxes": boxes,
        "labels": labels,
        "gt_mask": gt_mask,
    }
