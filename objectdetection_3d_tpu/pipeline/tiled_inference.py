"""Tiled inference over arbitrarily large scenes + global NMS merge.

The reference handles multi-million-point clouds only by capping voxel
counts (config.yaml:36) and density-downsampling (model/utils.py:15-43) —
scenes larger than the 40x40 m model range are simply cropped
(model/PointPillars.py:251-255).  The TPU build adds the static-shape
answer to unbounded scenes (BASELINE config #5): slide the model's fixed
xy window over the scene with overlap, run the jitted predictor per tile,
shift detections back into scene frame, and merge with a global greedy NMS.

Design history (each measured on the v5e tunnel):
* host crop: O(tiles x N) single-core numpy + ~19 MB upload/tile (~12 s).
* round-4 device crop: full-scene scatter compaction PER tile (~19 s) and
  35 m stride buckets wasted ~2/3 of the static point budget on
  out-of-window rows (detections collapsed 1120 -> 504 on the bench scene).
* this design: ONE device program for the whole scene.  The scene is
  shuffled (uniformizes later truncation) and stable-sorted by
  (fine x-column, y) once; each tile's candidate rows are then one run per
  x-column with EXACT y bounds (log-time searchsorted for the column base
  + one masked count for the y offset), sampled by a strided gather that
  stays spatially uniform when a run exceeds its static budget.  Crop and
  predict for ALL tiles run inside one ``jax.lax.map`` jit — one dispatch
  and one readback per scene, because per-call tunnel RPC (~27-150 ms)
  dominated every multi-dispatch formulation.

This is also the scale-out hook: tiles are independent, so a batch of
tiles can be data-parallel sharded across chips (spatial sharding is this
workload's analog of sequence parallelism) — pass a mesh-sharded
``predict_fn`` and the non-fused device path feeds it cropped tile
batches.
"""

import numpy as np
import jax
import jax.numpy as jnp

from objectdetection_3d_tpu.ops.nms import multiclass_nms


class TiledInference:
    """Sliding-window detector over scenes larger than the model range."""

    def __init__(self, model, variables, overlap=5.0, batch_tiles=1,
                 max_merge_boxes=2048, predict_fn=None, device_crop=True,
                 crop_cols=8, fused=None):
        """
        Args:
            model: PointPillars detector.
            variables: {'params', 'batch_stats'}.
            overlap: tile overlap in meters (objects up to ``overlap`` wide
                are seen whole by at least one tile).
            batch_tiles: tiles run per device batch.
            max_merge_boxes: static budget for the global NMS merge.
            predict_fn: external predict program (e.g. a mesh-sharded one,
                parallel/data_parallel.py).  Supplying one disables the
                fused whole-scene program (the external fn cannot be
                traced into it) — tiles are still cropped on device.
            device_crop: crop tiles on-device; False = numpy host crop.
            crop_cols: x-columns per tile width for the sort grid.  The
                crop is exact in y; finer columns cut the out-of-window
                x-margin (= wasted point budget) at the cost of more
                (static) gather runs per tile.
            fused: run sort + crop + EVERY tile's predict as one jitted
                ``lax.map`` program (one dispatch + one readback per
                scene).  Default: on whenever no external ``predict_fn``
                is supplied.
        """
        self.model = model
        self.variables = variables
        self.overlap = float(overlap)
        self.batch_tiles = int(batch_tiles)
        self.max_merge_boxes = int(max_merge_boxes)
        self.device_crop = bool(device_crop)
        self.crop_cols = int(crop_cols)
        self.fused = (predict_fn is None) if fused is None else bool(fused)
        self._predict = predict_fn or model.make_predict_fn()
        self._merge = jax.jit(self._merge_fn)
        self._pack = jax.jit(lambda ps: {
            k: jnp.stack([p[k] for p in ps])
            for k in ("bbox", "score", "label", "valid")})
        self._jit_cache = {}

        pcr = model.point_cloud_range
        self.tile_x = pcr[3] - pcr[0]
        self.tile_y = pcr[4] - pcr[1]
        self.xcell = self.tile_x / self.crop_cols
        # a tile window can straddle crop_cols + 1 x-columns
        self.n_runs = self.crop_cols + 1
        max_pts = int(model.tpu_cfg["max_points_static"])
        # candidate stage runs at 2x the model's point budget: per-column
        # caps then truncate only pathological clusters, and the second
        # stage compacts in-window rows first (uniformly at random) down
        # to the budget — matching the host crop's rng.choice semantics
        self.rb = max(2 * max_pts // self.n_runs // 8 * 8, 8)

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

    # ---- host crop path ----------------------------------------------
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

    # ---- on-device tile cropping --------------------------------------
    @staticmethod
    def _sort_scene_cols(scene, lo0, xcell):
        """Shuffle, then stable-sort the scene rows by (x-column, y).

        The up-front uniform shuffle makes any later truncation inside an
        exact-y run a uniform random subset ONLY within identical sort
        keys; spatial uniformity under truncation comes from the strided
        sampling in :meth:`_crop_cols`.  Padding rows (coords ~1e9) get a
        huge column id and sort to the tail.  Two composed stable argsorts
        realize the lexicographic (col, y) order without building a wide
        composite key (no int64 on TPU by default; f32 lacks the mantissa).
        """
        perm = jax.random.permutation(jax.random.PRNGKey(0),
                                      scene.shape[0])
        scene = scene[perm]
        in_scene = jnp.all(scene[:, :3] < 1e8, axis=1)
        xcol = jnp.floor((scene[:, 0] - lo0) / xcell).astype(jnp.int32)
        xcol = jnp.where(in_scene, xcol, jnp.int32(2 ** 30))
        o1 = jnp.argsort(scene[:, 1], stable=True)
        o2 = jnp.argsort(xcol[o1], stable=True)
        order = o1[o2]
        s = scene[order]
        return s, xcol[order], s[:, 1]

    def _crop_cols(self, sorted_scene, cols, ys, shift, lo0):
        """Assemble one tile's (max_pts, C) local-frame point buffer.

        The tile's candidates are ``n_runs`` contiguous runs of the
        (col, y)-sorted scene — one per x-column the window straddles,
        with EXACT y bounds: run start = searchsorted(col) + masked count
        of (col == c, y < y0) rows; run length likewise at y0 + tile_y.
        Each run is read by ONE strided gather of ``rb`` rows (2x the
        point budget across runs): stride 1 when the run fits (exact
        candidates), stride len/rb when it does not — a systematic
        spatial subsample of the y-sorted run, not a low-y bias.  A
        second stage then compacts the candidates to the model's point
        budget, IN-WINDOW rows first in uniform random order (the host
        path's ``rng.choice`` semantics), out-of-window x-margin rows as
        harmless filler (they self-filter in the voxelizer's range check
        after the shift — ops/voxelize.py ``in_range``, the same check
        that drops the reference's out-of-range points,
        model/PointPillars.py:251-255).
        """
        n_runs, rb = self.n_runs, self.rb
        max_pts = int(self.model.tpu_cfg["max_points_static"])
        x0, y0 = shift[0], shift[1]
        y1 = y0 + jnp.float32(self.tile_y)

        cx0 = jnp.floor((x0 - lo0) / self.xcell).astype(jnp.int32)
        run_cols = cx0 + jnp.arange(n_runs, dtype=jnp.int32)
        col_base = jnp.searchsorted(cols, run_cols, side="left")
        incol = cols[None, :] == run_cols[:, None]          # (R, N)
        lo_off = jnp.sum(incol & (ys[None, :] < y0), axis=1)
        hi_off = jnp.sum(incol & (ys[None, :] < y1), axis=1)
        starts = col_base + lo_off
        lens = hi_off - lo_off

        i = jnp.arange(rb, dtype=jnp.float32)

        def take_run(start, ln):
            stride = jnp.maximum(ln, rb).astype(jnp.float32) / rb
            off = jnp.floor(i * stride).astype(jnp.int32)
            valid = off < ln
            off = jnp.minimum(off, jnp.maximum(ln - 1, 0))
            vals = sorted_scene[start + off]                # (rb, C)
            local = jnp.concatenate([vals[:, :3] - shift, vals[:, 3:]],
                                    axis=1)
            return jnp.where(valid[:, None], local, jnp.float32(1e9)), \
                valid

        parts, valid = jax.vmap(take_run)(starts, lens)
        flat = parts.reshape(n_runs * rb, sorted_scene.shape[1])
        valid = valid.reshape(n_runs * rb)
        if n_runs * rb < max_pts:   # degenerate tiny budgets
            short = max_pts - n_runs * rb
            flat = jnp.concatenate(
                [flat, jnp.full((short, flat.shape[1]), 1e9,
                                flat.dtype)], axis=0)
            valid = jnp.concatenate([valid, jnp.zeros((short,), bool)])

        # stage 2: budget compaction — in-window rows first, uniformly
        # shuffled (so an over-budget tile keeps a uniform random subset
        # of its true points), margin rows as filler, sentinels last
        in_win = valid & (flat[:, 0] >= 0) & (flat[:, 0]
                                              < jnp.float32(self.tile_x))
        u = jax.random.uniform(jax.random.PRNGKey(1), (flat.shape[0],))
        key = (u + jnp.where(in_win, 0.0, 2.0)
               + jnp.where(valid, 0.0, 4.0))
        sel = jnp.argsort(key)[:max_pts]
        out = flat[sel]
        return jnp.where(valid[sel, None], out, jnp.float32(1e9))

    def _upload_scene(self, points):
        """Pad the scene to a 256k-row bucket (bounds jit recompiles)
        and push it through the tunnel once (~32 MB for 2M points)."""
        n, c = points.shape
        n_pad = max(-(-n // 262_144) * 262_144, 262_144)
        up = np.full((n_pad, c), 0.0, np.float32)
        up[:n] = points
        up[n:, :3] = 1e9  # outside every window
        return jax.device_put(up)

    # ---- fused whole-scene program -------------------------------------
    def _fused_program(self, scene_rows, scene_cols, n_chunks):
        """One jit for the whole scene: sort + per-tile crop + predict,
        tiles iterated by ``lax.map`` in ``batch_tiles`` chunks.  Per-call
        tunnel RPC (~27-150 ms each, measured) made every multi-dispatch
        formulation host-bound; this program costs ONE dispatch and one
        packed readback regardless of tile count."""
        key = (scene_rows, scene_cols, n_chunks, self.batch_tiles)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.model
        bt = self.batch_tiles
        max_pts = int(model.tpu_cfg["max_points_static"])

        def program(scene, shifts, lo0, variables, anchors):
            ss, cols, ys = self._sort_scene_cols(scene, lo0, self.xcell)

            def chunk_fn(shift_chunk):                     # (bt, 3)
                pts = jax.vmap(
                    lambda sh: self._crop_cols(ss, cols, ys, sh, lo0)
                )(shift_chunk)
                batch = {"points": pts,
                         "num_points": jnp.full((bt,), max_pts,
                                                 jnp.int32)}
                return model.predict(variables, batch, anchors)

            return jax.lax.map(chunk_fn,
                               shifts.reshape(n_chunks, bt, 3))

        fn = jax.jit(program)
        self._jit_cache[key] = fn
        return fn

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

        shifts_np = np.asarray([[x0, y0, lo[2]] for (x0, y0) in tiles],
                               np.float32)
        n_tiles = len(tiles)
        bt = self.batch_tiles
        n_chunks = -(-n_tiles // bt)
        pad_tiles = n_chunks * bt - n_tiles
        if pad_tiles:
            shifts_np = np.concatenate(
                [shifts_np, np.repeat(shifts_np[-1:], pad_tiles, 0)])

        if self.device_crop and self.fused:
            scene_dev = self._upload_scene(points)
            prog = self._fused_program(scene_dev.shape[0],
                                       scene_dev.shape[1], n_chunks)
            preds = prog(scene_dev, jnp.asarray(shifts_np),
                         jnp.float32(lo[0]), self.variables,
                         self.model.anchors)
            packed = jax.device_get(preds)          # (n_chunks, bt, ...)
            for t in range(n_tiles):
                ci, j = divmod(t, bt)
                v = packed["valid"][ci][j]
                b = packed["bbox"][ci][j][v].copy()
                b[:, 0] += tiles[t][0]
                b[:, 1] += tiles[t][1]
                b[:, 2] += lo[2]
                all_boxes.append(b)
                all_scores.append(packed["score"][ci][j][v])
                all_labels.append(packed["label"][ci][j][v])
            return self._merge_host(all_boxes, all_scores, all_labels)

        if self.device_crop:
            # non-fused device crop: an EXTERNAL predict program (e.g.
            # mesh-sharded) consumes device-cropped tile batches
            scene_dev = self._upload_scene(points)
            if "sort" not in self._jit_cache:
                self._jit_cache["sort"] = jax.jit(
                    self._sort_scene_cols, static_argnames=())
                self._jit_cache["crop"] = jax.jit(self._crop_cols)
            ss, cols, ys_d = self._jit_cache["sort"](
                scene_dev, jnp.float32(lo[0]), jnp.float32(self.xcell))
            shifts_dev = jax.device_put(shifts_np)
            num_dev = jnp.full((bt,), max_pts, jnp.int32)
            zeros = {
                "bboxes": jnp.zeros((bt, max_gt, 9), jnp.float32),
                "labels": jnp.zeros((bt, max_gt), jnp.int32),
                "gt_mask": jnp.zeros((bt, max_gt), bool),
            }
        else:
            sorted_pts, starts, grid = self._bucket_sort(points, lo)

        # Enqueue every tile's predict before reading ANY result back:
        # jax dispatch is async, so the device works on tile t while the
        # host crops tile t+1, and the readback coalesces into ONE
        # stacked fetch at the drain (per-array readbacks cost ~60 ms
        # of tunnel RPC each — 4 arrays x 25 tiles was ~6 s, measured).
        pending = []
        for ci in range(n_chunks):
            chunk = [tiles[min(ci * bt + j, n_tiles - 1)]
                     for j in range(bt)]
            pad = max((ci + 1) * bt - n_tiles, 0)

            if self.device_crop:
                parts = [self._jit_cache["crop"](
                    ss, cols, ys_d, shifts_dev[ci * bt + j],
                    jnp.float32(lo[0])) for j in range(bt)]
                batch = dict(zeros)
                batch["points"] = jnp.stack(parts)
                batch["num_points"] = num_dev
            else:
                batch_pts = np.zeros((bt, max_pts, points.shape[1]),
                                     np.float32)
                batch_n = np.zeros((bt,), np.int32)
                for j, (x0, y0) in enumerate(chunk):
                    local = self._crop_tile(sorted_pts, starts, grid, lo,
                                            pcr, x0, y0, max_pts)
                    batch_pts[j, :local.shape[0]] = local
                    batch_n[j] = local.shape[0]
                batch = {
                    "points": jnp.asarray(batch_pts),
                    "num_points": jnp.asarray(batch_n),
                    "bboxes": jnp.zeros((bt, max_gt, 9), jnp.float32),
                    "labels": jnp.zeros((bt, max_gt), jnp.int32),
                    "gt_mask": jnp.zeros((bt, max_gt), bool),
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
        return self._merge_host(all_boxes, all_scores, all_labels)

    def _merge_host(self, all_boxes, all_scores, all_labels):
        if not all_boxes or sum(len(b) for b in all_boxes) == 0:
            return []
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        labels = np.concatenate(all_labels)
        if len(boxes) > self.max_merge_boxes:
            # Over the static merge budget: keep the TOP-SCORING
            # candidates.  A cut in tile order silently drops
            # high-scoring detections from later tiles before the global
            # NMS (the reference's global suppression is score-sorted,
            # model/utils.py:398-424).
            top = np.argsort(-scores, kind="stable")[: self.max_merge_boxes]
            top.sort()  # keep tile order among the survivors
            boxes, scores, labels = boxes[top], scores[top], labels[top]

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
