"""Tiled inference over arbitrarily large scenes + global NMS merge.

The reference handles multi-million-point clouds only by capping voxel
counts (config.yaml:36) and density-downsampling (model/utils.py:15-43) —
scenes larger than the 40x40 m model range are simply cropped
(model/PointPillars.py:251-255).  The TPU build adds the static-shape
answer to unbounded scenes (BASELINE config #5): slide the model's fixed
xy window over the scene with overlap, run the jitted predictor per tile
(one compiled program, reused for every tile), shift detections back into
scene frame, and merge with a global greedy NMS.

This is also the scale-out hook: tiles are independent, so a batch of
tiles can be data-parallel sharded across chips (spatial sharding is this
workload's analog of sequence parallelism).
"""

import numpy as np
import jax
import jax.numpy as jnp

from objectdetection_3d_tpu.ops.nms import multiclass_nms


class TiledInference:
    """Sliding-window detector over scenes larger than the model range."""

    def __init__(self, model, variables, overlap=5.0, batch_tiles=1,
                 max_merge_boxes=2048, predict_fn=None, device_crop=True):
        """
        Args:
            model: PointPillars detector.
            variables: {'params', 'batch_stats'}.
            overlap: tile overlap in meters (objects up to ``overlap`` wide
                are seen whole by at least one tile).
            batch_tiles: tiles run per device batch.
            max_merge_boxes: static budget for the global NMS merge.
            device_crop: crop tiles on-device (upload the scene ONCE,
                jitted window-mask + rank-scatter compaction per tile).
                The host path masks/copies the candidate points per tile
                in numpy — measured 7 s of a 10 s 25-tile/2M-pt scene on
                a 1-vCPU host (bucket sort 2.9 s + crops 4.1 s), vs one
                ~32 MB upload and ~milliseconds per tile on-device.
        """
        self.model = model
        self.variables = variables
        self.overlap = float(overlap)
        self.batch_tiles = int(batch_tiles)
        self.max_merge_boxes = int(max_merge_boxes)
        self.device_crop = bool(device_crop)
        self._predict = predict_fn or model.make_predict_fn()
        self._merge = jax.jit(self._merge_fn)
        self._pack = jax.jit(lambda ps: {
            k: jnp.stack([p[k] for p in ps])
            for k in ("bbox", "score", "label", "valid")})

        pcr = model.point_cloud_range
        self.tile_x = pcr[3] - pcr[0]
        self.tile_y = pcr[4] - pcr[1]

    def _tile_origins(self, lo, hi, tile, overlap):
        stride = max(tile - overlap, tile * 0.5)
        n = max(int(np.ceil(max(hi - lo - overlap, 1e-9) / stride)), 1)
        origins = lo + stride * np.arange(n)
        # clamp the last tile inside the scene
        origins = np.minimum(origins, max(hi - tile, lo))
        return np.unique(origins)

    def _merge_fn(self, boxes, scores, labels, valid):
        num_classes = max(self.model.num_classes, 1)
        cls_scores = jnp.where(
            labels[:, None] == jnp.arange(num_classes)[None, :],
            scores[:, None], 0.0)
        keep = multiclass_nms(
            boxes, cls_scores,
            score_thr=float(self.model.head_cfg.get("score_thr", 0.1)),
            iou_thr=float(self.model.head_cfg.get("nms_thresh", 0.7)),
            nms_dim=self.model.nms_dim,
            valid_mask=valid)
        return jnp.any(keep, axis=1)

    def _bucket_sort(self, points, lo):
        """Pre-sort the scene into tile-stride buckets, once.

        A naive per-tile crop masks the FULL (N, 3) cloud per tile —
        O(tiles * N) host work, ~7 s for 25 tiles over 2M points on a
        1-vCPU host (measured; it dominated the tiled wall time).  One
        argsort by bucket id makes each tile's candidate set the few
        contiguous bucket slices its window overlaps.
        """
        sx = max(self.tile_x - self.overlap, self.tile_x * 0.5)
        sy = max(self.tile_y - self.overlap, self.tile_y * 0.5)
        bx = np.floor((points[:, 0] - lo[0]) / sx).astype(np.int64)
        by = np.floor((points[:, 1] - lo[1]) / sy).astype(np.int64)
        nbx = max(int(bx.max()) + 1, 1)
        nby = max(int(by.max()) + 1, 1)
        bid = bx * nby + by
        order = np.argsort(bid, kind="stable")
        sorted_pts = points[order]
        starts = np.searchsorted(bid[order], np.arange(nbx * nby + 1))
        return sorted_pts, starts, (sx, sy, nbx, nby)

    def _crop_tile(self, sorted_pts, starts, grid, lo, pcr, x0, y0,
                   max_pts):
        sx, sy, nbx, nby = grid
        # buckets whose stride cell can intersect [x0, x0 + tile)
        bx0 = max(int(np.floor((x0 - lo[0]) / sx)), 0)
        bx1 = min(int(np.floor((x0 + self.tile_x - lo[0]) / sx)), nbx - 1)
        by0 = max(int(np.floor((y0 - lo[1]) / sy)), 0)
        by1 = min(int(np.floor((y0 + self.tile_y - lo[1]) / sy)), nby - 1)
        parts = []
        for cx in range(bx0, bx1 + 1):
            for cy in range(by0, by1 + 1):
                b = cx * nby + cy
                parts.append(sorted_pts[starts[b]:starts[b + 1]])
        cand = parts[0] if len(parts) == 1 else np.concatenate(parts)
        shift = np.array([x0, y0, lo[2]], np.float32)
        xyz = cand[:, :3]
        sel = np.all((xyz >= pcr[:3] + shift)
                     & (xyz < pcr[3:] + shift), axis=1)
        local = cand[sel]
        local[:, :3] -= shift
        if local.shape[0] > max_pts:
            idx = np.random.default_rng(0).choice(
                local.shape[0], max_pts, replace=False)
            local = local[idx]
        return local

    # ---- on-device tile cropping ------------------------------------
    # The host crop paths above cost seconds of single-core numpy per
    # large scene; these jitted programs replace them with ONE scene
    # upload plus a window-mask + rank-scatter compaction per tile (the
    # scatter stays unique-indexed, so it does not serialize on TPU).

    @staticmethod
    def _shuffle_scene(scene):
        """One-time uniform row shuffle: per-tile truncation at the
        static point budget then keeps a UNIFORM random subset of the
        in-window points (the host path's ``rng.choice`` semantics)."""
        perm = jax.random.permutation(jax.random.PRNGKey(0),
                                      scene.shape[0])
        return scene[perm]

    @staticmethod
    def _crop_device(scene, shift, pcr_lo, pcr_hi, max_pts):
        """Compact the in-window rows of ``scene`` into a (max_pts, C)
        buffer in model-local coordinates.

        scene: (N, C) with xyz in the leading columns (padding rows carry
        out-of-range coords).  shift: (3,) tile origin.  Returns
        (points (max_pts, C), n) with n = min(#in-window, max_pts).
        """
        xyz = scene[:, :3]
        m = jnp.all((xyz >= pcr_lo + shift) & (xyz < pcr_hi + shift),
                    axis=1)
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        n_rows = scene.shape[0]
        # masked rows get unique ascending ranks; everything else is
        # routed out of bounds and dropped — unique indices, no
        # serializing scatter
        dest = jnp.where(m & (rank < max_pts), rank, n_rows + max_pts)
        out = jnp.zeros((max_pts, scene.shape[1]), scene.dtype).at[
            dest].set(scene, mode="drop", unique_indices=True)
        local_xyz = out[:, :3] - shift
        out = jnp.concatenate([local_xyz, out[:, 3:]], axis=1)
        n = jnp.minimum(jnp.sum(m.astype(jnp.int32)), max_pts)
        # zero the tail beyond n (scatter already leaves it zero, but the
        # xyz shift above touched every row)
        valid = (jnp.arange(max_pts) < n)[:, None]
        return out * valid.astype(out.dtype), n

    def _upload_scene(self, points):
        """Pad the scene to a 256k-row bucket (bounds jit recompiles),
        push it through the tunnel once, and shuffle on-device."""
        n, c = points.shape
        n_pad = max(-(-n // 262_144) * 262_144, 262_144)
        up = np.full((n_pad, c), 0.0, np.float32)
        up[:n] = points
        up[n:, :3] = 1e9  # outside every window
        scene = jax.device_put(up)
        if not hasattr(self, "_shuffle_jit"):
            self._shuffle_jit = jax.jit(self._shuffle_scene)
        return self._shuffle_jit(scene)

    def __call__(self, points):
        """Detect over a full scene.

        Args:
            points: (N, C) numpy cloud in scene coordinates (feature
                columns as configured for the model).
        Returns:
            list of {'bbox', 'label', 'score'} dicts in scene coordinates.
        """
        points = np.asarray(points, np.float32)
        lo = points[:, :3].min(axis=0)
        hi = points[:, :3].max(axis=0)

        xs = self._tile_origins(lo[0], hi[0], self.tile_x, self.overlap)
        ys = self._tile_origins(lo[1], hi[1], self.tile_y, self.overlap)

        max_pts = int(self.model.tpu_cfg["max_points_static"])
        max_gt = int(self.model.tpu_cfg["max_gt_static"])
        pcr = np.asarray(self.model.point_cloud_range)

        tiles = [(x0, y0) for x0 in xs for y0 in ys]
        all_boxes, all_scores, all_labels = [], [], []

        if self.device_crop:
            scene_dev = self._upload_scene(points)
            if not hasattr(self, "_crop_jit"):
                self._crop_jit = jax.jit(
                    self._crop_device, static_argnames=("max_pts",))
            pcr_lo = jnp.asarray(pcr[:3], jnp.float32)
            pcr_hi = jnp.asarray(pcr[3:], jnp.float32)
            # ONE upload for every tile origin: a per-tile jnp.asarray is
            # a synchronous ~27 ms tunnel transfer, x25 tiles; slicing a
            # device-resident array is an async dispatch instead
            shifts_dev = jax.device_put(np.asarray(
                [[x0, y0, lo[2]] for (x0, y0) in tiles], np.float32))
            shift_of = {t: i for i, t in enumerate(tiles)}
            zeros = {
                "bboxes": jnp.zeros((self.batch_tiles, max_gt, 9),
                                    jnp.float32),
                "labels": jnp.zeros((self.batch_tiles, max_gt), jnp.int32),
                "gt_mask": jnp.zeros((self.batch_tiles, max_gt), bool),
            }
        else:
            sorted_pts, starts, grid = self._bucket_sort(points, lo)

        # Enqueue every tile's predict before reading ANY result back:
        # jax dispatch is async, so the device works on tile t while the
        # host crops tile t+1, and the readback coalesces into ONE
        # stacked fetch at the drain (per-array readbacks cost ~60 ms
        # of tunnel RPC each — 4 arrays x 25 tiles was ~6 s, measured).
        pending = []
        for i in range(0, len(tiles), self.batch_tiles):
            chunk = tiles[i:i + self.batch_tiles]
            pad = self.batch_tiles - len(chunk)
            chunk = chunk + [chunk[-1]] * pad

            if self.device_crop:
                parts = [self._crop_jit(
                    scene_dev, shifts_dev[shift_of[(x0, y0)]],
                    pcr_lo, pcr_hi, max_pts=max_pts)
                    for (x0, y0) in chunk]
                batch = dict(zeros)
                batch["points"] = jnp.stack([p for p, _ in parts])
                batch["num_points"] = jnp.stack([n for _, n in parts])
            else:
                batch_pts = np.zeros((self.batch_tiles, max_pts,
                                      points.shape[1]), np.float32)
                batch_n = np.zeros((self.batch_tiles,), np.int32)
                for j, (x0, y0) in enumerate(chunk):
                    local = self._crop_tile(sorted_pts, starts, grid, lo,
                                            pcr, x0, y0, max_pts)
                    batch_pts[j, :local.shape[0]] = local
                    batch_n[j] = local.shape[0]
                batch = {
                    "points": jnp.asarray(batch_pts),
                    "num_points": jnp.asarray(batch_n),
                    "bboxes": jnp.zeros((self.batch_tiles, max_gt, 9),
                                        jnp.float32),
                    "labels": jnp.zeros((self.batch_tiles, max_gt),
                                        jnp.int32),
                    "gt_mask": jnp.zeros((self.batch_tiles, max_gt), bool),
                }
            preds = self._predict(self.variables, batch)
            pending.append((chunk, pad, preds))

        # one jitted stack + one fetch for the whole scene
        packed = self._pack([p for _, _, p in pending])
        packed = jax.device_get(packed)
        for t, (chunk, pad, _) in enumerate(pending):
            bbox, score = packed["bbox"][t], packed["score"][t]
            label, valid = packed["label"][t], packed["valid"][t]
            for j, (x0, y0) in enumerate(chunk[:len(chunk) - pad]):
                v = valid[j]
                b = bbox[j][v].copy()
                b[:, 0] += x0
                b[:, 1] += y0
                b[:, 2] += lo[2]
                all_boxes.append(b)
                all_scores.append(score[j][v])
                all_labels.append(label[j][v])

        if not all_boxes or sum(len(b) for b in all_boxes) == 0:
            return []
        boxes = np.concatenate(all_boxes)[: self.max_merge_boxes]
        scores = np.concatenate(all_scores)[: self.max_merge_boxes]
        labels = np.concatenate(all_labels)[: self.max_merge_boxes]

        n = self.max_merge_boxes
        pb = np.zeros((n, 9), np.float32)
        pb[:len(boxes)] = boxes
        ps = np.zeros((n,), np.float32)
        ps[:len(scores)] = scores
        pl = np.zeros((n,), np.int32)
        pl[:len(labels)] = labels
        pv = np.arange(n) < len(boxes)

        keep = np.asarray(self._merge(
            jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(pl),
            jnp.asarray(pv)))[:len(boxes)]

        return [{"bbox": boxes[k], "label": int(labels[k]),
                 "score": float(scores[k])}
                for k in np.where(keep)[0]]
