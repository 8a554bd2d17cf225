"""Object-detection pipeline: training / validation / testing / inference.

Mirrors the reference ObjectDetection pipeline (pipeline/pipeline.py:24-535)
and its artifact set — ``process_config.json``, per-run ``log_train_*.txt`` /
``log_test_*.txt``, ``training_record.csv``, ``metrics.npy``,
``test_protocol.yaml``, periodic ``ckpt_*`` plus best-F1 ``ckpt_best`` —
while the compute path is a jitted train step / eval step on static-shape
batches with host-thread prefetch.
"""

import json
import logging
import os
import random
import re
from datetime import datetime
from os.path import join

import numpy as np
import yaml
import jax
import jax.numpy as jnp

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(x, **kwargs):
        return x

import pandas as pd

from objectdetection_3d_tpu.dataset.loader import (
    DataLoader,
    PreprocessedDataset,
    StaticBatcher,
)
from objectdetection_3d_tpu.metrics import MetricEvaluator
from objectdetection_3d_tpu.pipeline import checkpoint as ckpt_io
from objectdetection_3d_tpu.pipeline.base_pipeline import BasePipeline
from objectdetection_3d_tpu.pipeline.utils import latest_ckpt
from objectdetection_3d_tpu.utils import make_dir

log = logging.getLogger(__name__)


class ObjectDetection(BasePipeline):
    """Pipeline for object detection."""

    def __init__(self, model, dataset, global_cfg, **kwargs):
        super().__init__(model=model, dataset=dataset,
                         global_cfg=global_cfg, **kwargs)
        self.ME = MetricEvaluator(eval_dim=self.cfg.get("eval_dim", 3))

        tcfg = model.tpu_cfg
        self.batcher = StaticBatcher(
            max_points=tcfg["max_points_static"],
            max_gt=tcfg["max_gt_static"],
            num_features=len(model.input_features),
            box_params_num=model.box_params_num,
            seed=kwargs.get("seed", 0))

        self.state = None          # {'params','batch_stats','opt_state'}
        self.optimizer = None
        self._train_step = None
        self._eval_fn = None
        self._predict_fn = None

        # multi-chip scale-out (SURVEY §2.9): data_parallel chips shard the
        # batch, spatial_parallel chips shard the pseudo-image's H dim
        self.data_parallel = max(int(self.cfg.get("data_parallel", 1) or 1),
                                 1)
        self.spatial_parallel = max(
            int(self.cfg.get("spatial_parallel", 1) or 1), 1)
        self._mesh = None

    # ------------------------------------------------------------------
    # checkpointing (reference pipeline/pipeline.py:36-96)
    # ------------------------------------------------------------------
    def save_ckpt(self, epoch, save_best=False):
        ckpt_dir = join(self.cfg.log_dir, "checkpoint/")
        make_dir(ckpt_dir)
        backend = self.cfg.get("ckpt_backend", "pickle")
        ext = "orbax" if backend == "orbax" else "pkl"
        path = join(ckpt_dir, f"ckpt_best.{ext}" if save_best
                    else f"ckpt_{epoch:05d}.{ext}")
        if self.cfg.get("async_ckpt", True):
            # state is snapshotted to host before save() returns; the
            # write itself overlaps the next epoch's compute
            if not hasattr(self, "_ckpt_saver"):
                self._ckpt_saver = ckpt_io.AsyncSaver()
            self._ckpt_saver.save(path, epoch, self.state, backend=backend)
        else:
            ckpt_io.save_ckpt(path, epoch, self.state, backend=backend)
        log.info(f"Epoch {epoch:3d}: save ckpt to {path:s}")

    def wait_for_ckpts(self):
        """Drain pending async checkpoint writes (no-op when sync)."""
        saver = getattr(self, "_ckpt_saver", None)
        if saver is not None:
            saver.wait()

    def load_ckpt(self):
        self.wait_for_ckpts()
        ckpt_dir = join(self.cfg.log_dir, "checkpoint/")
        epoch = 0

        if not self.cfg.get("inference_mode"):
            if self.cfg.get("is_resume"):
                last_ckpt_path = latest_ckpt(ckpt_dir)
                if last_ckpt_path:
                    epoch = int(re.findall(r"\d+", last_ckpt_path)[-1]) + 1
                    ckpt_path = last_ckpt_path
                    log.info("Model restored from the latest checkpoint: "
                             "{}".format(epoch))
                else:
                    log.info("Latest checkpoint was not found")
                    log.info("Initializing from scratch.")
                    return epoch, None
            else:
                log.info("Initializing from scratch.")
                return epoch, None
        else:
            backend = self.cfg.get("ckpt_backend", "pickle")
            ext = "orbax" if backend == "orbax" else "pkl"
            ckpt_path = join(ckpt_dir, f"ckpt_best.{ext}")
            if not os.path.exists(ckpt_path):
                # The reference crashes here outright (pipeline/pipeline.py:81
                # loads ckpt_best.pth unconditionally); ckpt_best only exists
                # once validation F1 has ever beaten 0.  Degrade gracefully to
                # the newest periodic checkpoint so a short or unlucky training
                # run is still testable; raise only if there is nothing at all.
                fallback = latest_ckpt(ckpt_dir)
                if fallback:
                    log.warning(
                        "No best checkpoint at %s (validation F1 never "
                        "improved); falling back to the latest periodic "
                        "checkpoint %s", ckpt_path, fallback)
                    ckpt_path = fallback
                else:
                    raise ValueError(
                        "There is no pretrained model for inference. Best "
                        "output of training should be found as "
                        "{}".format(ckpt_path))

        log.info(f"Loading checkpoint {ckpt_path}")
        payload = ckpt_io.load_ckpt(ckpt_path)
        if self.state is None:
            self._init_state()
        self.state["params"] = payload["params"]
        self.state["batch_stats"] = payload["batch_stats"]
        if "opt_state" in payload and self.optimizer is not None and \
                payload["opt_state"] is not None:
            log.info("Loading checkpoint optimizer state")
            try:
                flat_new = jax.tree_util.tree_leaves(payload["opt_state"])
                treedef = jax.tree_util.tree_structure(
                    self.state["opt_state"])
                self.state["opt_state"] = jax.tree_util.tree_unflatten(
                    treedef, flat_new)
            except Exception as e:  # structure mismatch: keep fresh state
                log.warning("Could not restore optimizer state: %s", e)
        return epoch, ckpt_path

    # ------------------------------------------------------------------
    # state / jit management
    # ------------------------------------------------------------------
    def _init_state(self):
        variables = self.model.init_variables(
            jax.random.PRNGKey(int(self.rng.integers(np.iinfo(np.int32).max))))
        opt_state = None
        if self.optimizer is not None:
            opt_state = self.optimizer.init(variables["params"])
        self.state = {"params": variables["params"],
                      "batch_stats": variables["batch_stats"],
                      "opt_state": opt_state}
        if getattr(self.model, "device_augment", ()):
            self.state["rng"] = jax.random.PRNGKey(
                int(self.rng.integers(np.iinfo(np.int32).max)))

    def _variables(self):
        return {"params": self.state["params"],
                "batch_stats": self.state["batch_stats"]}

    def _device_arrays(self, batch):
        return {k: jnp.asarray(v) for k, v in batch.arrays.items()}

    def _attach_log_file(self, log_file_path):
        """Route module logs to a per-run file, replacing any file handler
        a previous run_training/run_testing call on this process attached
        (repeated calls must not multiply log lines)."""
        old = getattr(self, "_log_file_handler", None)
        if old is not None:
            log.removeHandler(old)
            old.close()
        handler = logging.FileHandler(log_file_path)
        log.addHandler(handler)
        self._log_file_handler = handler

    def _multichip(self):
        return self.data_parallel > 1 or self.spatial_parallel > 1

    def _ensure_mesh(self):
        """Build the device mesh requested by the ``data_parallel`` /
        ``spatial_parallel`` pipeline config keys (None when both are 1)."""
        if not self._multichip():
            return None
        if self._mesh is None:
            from objectdetection_3d_tpu.parallel import (make_mesh,
                                                         make_mesh_2d)
            if self.spatial_parallel > 1:
                self._mesh = make_mesh_2d(self.data_parallel,
                                          self.spatial_parallel)
            else:
                self._mesh = make_mesh(self.data_parallel)
            log.info("Device mesh: %s", dict(zip(self._mesh.axis_names,
                                                 self._mesh.devices.shape)))
        return self._mesh

    def _global_batch(self, per_replica):
        """Loader batch size: per-replica size x data-parallel replicas."""
        return max(int(per_replica), 1) * self.data_parallel

    def _ensure_eval_fn(self):
        if self._eval_fn is None:
            mesh = self._ensure_mesh()
            if mesh is not None:
                from objectdetection_3d_tpu.parallel import (
                    make_sharded_eval_fn)
                self._eval_fn = make_sharded_eval_fn(self.model, mesh)
            else:
                self._eval_fn = self.model.make_eval_fn()
        return self._eval_fn

    def _ensure_predict_fn(self):
        if self._predict_fn is None:
            self._predict_fn = self.model.make_predict_fn()
        return self._predict_fn

    # ------------------------------------------------------------------
    # metric plumbing (reference pipeline/pipeline.py:98-129)
    # ------------------------------------------------------------------
    @staticmethod
    def _target_for_metric(boxes, labels):
        return {"bbox": np.asarray(boxes, np.float32).reshape(-1, 9),
                "label": np.asarray(labels).reshape(-1),
                "score": np.ones((len(boxes),), np.float32)}

    @staticmethod
    def _pred_for_metric(preds, i):
        valid = np.asarray(preds["valid"][i])
        return {"bbox": np.asarray(preds["bbox"][i])[valid],
                "label": np.asarray(preds["label"][i])[valid],
                "score": np.asarray(preds["score"][i])[valid]}

    # ------------------------------------------------------------------
    # inference entry points
    # ------------------------------------------------------------------
    def run_inference(self, data, validate=False):
        """Run inference on one preprocessed data item
        (reference pipeline/pipeline.py:132-158).

        ``validate=True`` checks user-supplied GT boxes at the host
        boundary with the reference's degenerate-box error semantics
        (reference ops/ops_torch.py:610-690); inside jit the IoU is
        padding-safe instead of raising.
        """
        if validate:
            from objectdetection_3d_tpu.ops.boxes import validate_boxes

            item = data["data"] if isinstance(data, dict) and "data" in data \
                else data
            if isinstance(item, dict) and item.get("bboxes") is not None:
                validate_boxes(item["bboxes"])
        if self.state is None:
            self._init_state()
        self.load_ckpt()
        if isinstance(data, dict) and "data" in data:
            batch = self.batcher.collate([data])
        else:
            batch = self.batcher.collate([{"data": data, "attr": {}}])
        predict = self._ensure_predict_fn()
        preds = predict(self._variables(), self._device_arrays(batch))
        return self.model.inference_end(preds)

    def show_inference(self):
        """Metric + visual check on one random test sample
        (reference pipeline/pipeline.py:160-229)."""
        test_dataset = self.dataset.get_split("test")
        test_split = PreprocessedDataset(dataset=test_dataset,
                                         preprocess=self.model.preprocess,
                                         transform=self.model.transform)
        idx = random.sample(range(0, len(test_dataset)), 1)
        print(idx)
        data_item = test_split[idx[0]]
        print(test_dataset.get_attr(idx[0]))

        if self.state is None:
            self._init_state()
        self.load_ckpt()
        batch = self.batcher.collate([data_item])
        predict = self._ensure_predict_fn()
        preds = predict(self._variables(), self._device_arrays(batch))

        data = data_item["data"]
        target = [self._target_for_metric(data["bboxes"], data["labels"])]
        prediction = [self._pred_for_metric(preds, 0)]

        precision, recall = self.ME.evaluate(
            prediction, target, self.model.classes_ids,
            self.cfg.get("overlaps", [0.1]))

        print("")
        print(f' {" ": <9} "==== Precision ==== Recall ==== F1 ====" ')
        precision = np.mean(precision[:, -1])
        recall = np.mean(recall[:, -1])
        f1 = 2 * precision * recall / (precision + recall)
        print("Overall_precision: {:.2f}".format(precision))
        print("Overall_recall: {:.2f}".format(recall))
        print("F1: {:.2f}".format(f1))

        self._draw(data, prediction[0])
        return prediction[0]

    def _draw(self, data, prediction):
        """Open3D viewer with red predictions / green GT, if available;
        headless matplotlib PNG in the run directory otherwise."""
        try:
            import open3d as o3d
        except ImportError:
            log.info("open3d not available; rendering matplotlib PNG")
            self._draw_matplotlib(data, prediction)
            return

        from objectdetection_3d_tpu.augment.numpy_ops import (
            rotation_matrix_zyx)

        geometries = []
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(data["point"][:, :3])
        geometries.append(pcd)

        for box in prediction["bbox"]:
            roll, pitch, yaw = rotation_matrix_zyx(*box[6:9])
            o3box = o3d.geometry.OrientedBoundingBox(
                box[:3], yaw @ pitch @ roll, box[3:6])
            o3box.color = (1, 0, 0)
            geometries.append(o3box)

        for box in np.array(data["bboxes"]):
            box = box.copy()
            box[2] = box[2] + box[5] / 2
            roll, pitch, yaw = rotation_matrix_zyx(*box[6:9])
            o3box = o3d.geometry.OrientedBoundingBox(
                box[:3], yaw @ pitch @ roll, box[3:6])
            o3box.color = (0, 1, 0)
            geometries.append(o3box)

        o3d.visualization.draw_geometries(geometries)

    def _draw_matplotlib(self, data, prediction, max_points=60_000):
        """Headless fallback for the reference's open3d viewer
        (reference pipeline/pipeline.py:199-229): cloud + red predicted
        / green GT wireframes, saved as a PNG next to the run logs."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from objectdetection_3d_tpu.augment.numpy_ops import (
            bbox2corners3D_np)

        pts = np.asarray(data["point"])[:, :3]
        if len(pts) > max_points:
            sel = np.random.default_rng(0).choice(len(pts), max_points,
                                                  replace=False)
            pts = pts[sel]

        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.3, c=pts[:, 2],
                   cmap="viridis", alpha=0.5, linewidths=0)

        # bottom ring, top ring, verticals of the 8-corner ordering
        edges = [(0, 1), (1, 2), (2, 3), (3, 0),
                 (4, 5), (5, 6), (6, 7), (7, 4),
                 (0, 4), (1, 5), (2, 6), (3, 7)]

        def wires(box, color):
            c = bbox2corners3D_np(np.asarray(box, np.float64))
            for a, b in edges:
                ax.plot(*zip(c[a], c[b]), color=color, linewidth=1.2)

        for box in np.asarray(prediction["bbox"]):
            box = np.array(box, np.float64).copy()
            box[2] -= box[5] / 2  # decode emits z at CENTER; wires want bottom
            wires(box, "red")
        for box in np.asarray(data["bboxes"]):
            wires(box, "green")  # GT z is at the bottom already

        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_zlabel("z [m]")
        ax.set_title("red = predicted, green = ground truth")
        out = join(self.cfg.log_dir,
                   "show_inference_{}.png".format(
                       datetime.now().strftime("%Y-%m-%d_%H:%M:%S")))
        fig.savefig(out, dpi=130, bbox_inches="tight")
        plt.close(fig)
        log.info("visualization written to %s", out)
        print(f"visualization written to {out}")

    # ------------------------------------------------------------------
    # evaluation loops
    # ------------------------------------------------------------------
    def _eval_split(self, split_name, batch_size, compute_losses=True):
        """Shared valid/test loop: returns (losses_dict, pred, target)."""
        split = PreprocessedDataset(
            dataset=self.dataset.get_split(split_name),
            preprocess=self.model.preprocess,
            transform=self.model.transform,
            seed=self.cfg.get("seed", 0))
        loader = DataLoader(split, self.batcher,
                            batch_size=self._global_batch(batch_size),
                            prefetch=2,
                            num_workers=self.cfg.get("num_workers", 0))
        eval_fn = self._ensure_eval_fn()

        losses_acc = {}
        prediction, target = [], []
        for batch in tqdm(loader, desc=split_name):
            arrays = self._device_arrays(batch)
            losses, preds = eval_fn(self._variables(), arrays)
            if compute_losses:
                for k, v in losses.items():
                    losses_acc.setdefault(k, []).append(float(v))
            for i in range(len(batch.attr)):
                if getattr(batch, "pad_flags", None) and batch.pad_flags[i]:
                    continue
                if batch.arrays["num_points"][i] == 0:
                    log.info("Invalid point cloud load: {}".format(
                        batch.attr[i].get("path")))
                    continue
                target.append(self._target_for_metric(
                    batch.unpadded_boxes(i), batch.unpadded_labels(i)))
                prediction.append(self._pred_for_metric(preds, i))
        return losses_acc, prediction, target

    def _log_pr(self, precision, recall):
        log.info("")
        log.info(f' {" ": <9} "==== Precision ==== Recall ==== F1 ====" ')
        for i, c in enumerate(self.model.classes):
            p = precision[i, 0]
            rec = recall[i, 0]
            f1 = 2 * p * rec / (p + rec) if (p + rec) > 0 else 0.0
            log.info(f' {c: <15} {p: <15.2f} {rec: <10.2f} {f1:.2f}')
        precision = np.mean(precision[:, -1])
        recall = np.mean(recall[:, -1])
        f1 = (2 * precision * recall / (precision + recall)
              if (precision + recall) > 0 else 0.0)
        log.info("")
        log.info("Overall_precision: {:.2f}".format(precision))
        log.info("Overall_recall: {:.2f}".format(recall))
        log.info("F1: {:.2f}".format(f1))
        return float(precision), float(recall), float(f1)

    def run_valid(self):
        """Validation losses + precision/recall/F1
        (reference pipeline/pipeline.py:330-431)."""
        log.info("Started validation")
        losses_acc, prediction, target = self._eval_split(
            "validation", self.cfg.get("validation_batch_size", 1))

        sum_loss = 0.0
        desc = "validation - "
        valid_losses = {}
        for k, v in losses_acc.items():
            valid_losses[k] = np.mean(v)
            desc += " %s: %.03f" % (k, valid_losses[k])
            sum_loss += valid_losses[k]
        desc += " > loss: %.03f" % sum_loss
        log.info(desc)

        precision, recall = self.ME.evaluate(
            prediction, target, self.model.classes_ids,
            self.cfg.get("overlaps", [0.1]))
        p, r, f1 = self._log_pr(precision, recall)
        valid_losses["precision"] = p
        valid_losses["recall"] = r
        valid_losses["f1"] = f1
        return valid_losses

    def run_testing(self):
        """Test-split evaluation writing ``test_protocol.yaml``
        (reference pipeline/pipeline.py:232-328)."""
        test_folder = join(self.cfg.log_dir, "test/")
        make_dir(test_folder)
        timestamp = datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
        log.info("DEVICE : {}".format(self.device))
        log_file_path = join(test_folder, "log_test_" + timestamp + ".txt")
        log.info("Logging in file : {}".format(log_file_path))
        self._attach_log_file(log_file_path)

        if self.state is None:
            self._init_state()
        self.load_ckpt()
        log.info("Started testing")

        _, prediction, target = self._eval_split(
            "testing", self.cfg.get("testing_batch_size", 1),
            compute_losses=False)

        precision, recall = self.ME.evaluate(
            prediction, target, self.model.classes_ids,
            self.cfg.get("overlaps", [0.1]))
        p, r, f1 = self._log_pr(precision, recall)

        test_protocol = {
            "0_model": self.cfg.get("model_name", None),
            "1_model_version": self.cfg.get("resume_from", None),
            "2_dataset": self.cfg.get("dataset_name", None),
            "3_date": datetime.now().strftime("%Y-%m-%d_%H:%M:%S"),
            "4_precision": p,
            "5_recall": r,
            "6_f1": f1,
        }
        with open(join(test_folder, "test_protocol.yaml"), "w") as outfile:
            yaml.dump(test_protocol, outfile)
        return test_protocol

    # ------------------------------------------------------------------
    # training (reference pipeline/pipeline.py:434-535)
    # ------------------------------------------------------------------
    def run_training(self):
        with open(join(self.cfg.log_dir, "process_config.json"),
                  "w") as outfile:
            json.dump(dict(self.global_cfg), outfile, default=str)

        log.info("DEVICE : {}".format(self.device))
        timestamp = datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
        log_file_path = join(self.cfg.log_dir,
                             "log_train_" + timestamp + ".txt")
        log.info("Logging in file : {}".format(log_file_path))
        self._attach_log_file(log_file_path)

        train_split = PreprocessedDataset(
            dataset=self.dataset.get_split("training"),
            preprocess=self.model.preprocess,
            transform=self.model.transform,
            seed=self.cfg.get("seed", 0))
        train_loader = DataLoader(
            train_split, self.batcher,
            batch_size=self._global_batch(
                self.cfg.get("training_batch_size", 1)),
            prefetch=2,
            num_workers=self.cfg.get("num_workers", 0))

        self.optimizer = self.model.get_optimizer(
            dict(self.cfg.get("optimizer", {})),
            grad_clip_value=self.cfg.get("grad_clip_norm", -1))
        self._init_state()
        mesh = self._ensure_mesh()
        if mesh is not None:
            from objectdetection_3d_tpu.parallel import (
                make_sharded_train_step)
            mb = int(self.model.tpu_cfg.get("microbatch", 0) or 0)
            self._train_step = make_sharded_train_step(
                self.model, self.optimizer, mesh,
                space_axis="space" if self.spatial_parallel > 1 else None,
                donate=False, microbatch=mb if mb > 0 else None)
            if mb > 0:
                log.info("Gradient accumulation: microbatch=%d", mb)
            log.info("Training %d-way data-parallel%s (global batch %d)",
                     self.data_parallel,
                     (f" x {self.spatial_parallel}-way spatial"
                      if self.spatial_parallel > 1 else ""),
                     self._global_batch(
                         self.cfg.get("training_batch_size", 1)))
        else:
            # tpu: microbatch > 0 trains big batches as gradient
            # accumulation (lax.scan over chunks in one jit) — the
            # HBM-fitting formulation of the reference's batch loop
            # (reference pipeline/pipeline.py:458-466); 0 = monolithic.
            mb = int(self.model.tpu_cfg.get("microbatch", 0) or 0)
            self._train_step = self.model.make_train_step(
                self.optimizer, donate=False,
                microbatch=mb if mb > 0 else None)
            if mb > 0:
                log.info("Gradient accumulation: microbatch=%d", mb)
        start_ep, _ = self.load_ckpt()

        record_path = join(self.cfg.log_dir, "training_record.csv")
        if os.path.exists(record_path):
            training_record = pd.read_csv(record_path, index_col=False)
        else:
            training_record = pd.DataFrame(
                [], columns=["epoch", "precision", "recall", "f1"])

        from objectdetection_3d_tpu.profiling import (StepTimer,
                                                      TensorBoardLogger,
                                                      trace)

        timer = StepTimer(log_every=self.cfg.get("log_step_freq", 50))
        tb = TensorBoardLogger(self.cfg.get("tensorboard", False),
                               self.cfg.log_dir)
        # resume continues the scalar stream at the right step index
        global_step = max(start_ep - 1, 0) * len(train_loader)
        profile_dir = self.cfg.get("profile_dir", None)
        profile_steps = int(self.cfg.get("profile_steps", 0))
        profiled = 0

        # preemption safety: SIGTERM/SIGINT request a checkpoint + clean
        # stop at the next epoch boundary instead of killing the process
        # mid-write (resume with is_resume: true)
        import signal

        self._preempted = False

        def _request_stop(signum, frame):
            if self._preempted:
                # second signal: the user really wants out NOW — restore
                # the original handler and re-raise so repeated Ctrl-C is
                # never swallowed for a whole epoch
                log.warning("Second signal %s: aborting immediately",
                            signum)
                prev = old_handlers.get(signum, signal.SIG_DFL)
                signal.signal(signum, prev)
                signal.raise_signal(signum)
                return
            log.warning("Signal %s received: will checkpoint and stop "
                        "after the current epoch (repeat to abort "
                        "immediately)", signum)
            self._preempted = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread (tests)
                pass

        log.info("Started training")
        for epoch in range(start_ep, self.cfg.get("max_epoch", 1) + 1):
            log.info(f"================================ EPOCH {epoch:d}/"
                     f"{self.cfg.get('max_epoch', 1):d} "
                     f"================================")
            train_split.set_epoch(epoch)  # fresh augmentation stream
            self.losses = {}
            process_bar = tqdm(train_loader, desc="training")
            for batch in process_bar:
                arrays = self._device_arrays(batch)
                if profile_dir and profiled < profile_steps:
                    with trace(profile_dir):
                        self.state, losses = self._train_step(self.state,
                                                              arrays)
                        jax.block_until_ready(losses)
                    profiled += 1
                else:
                    self.state, losses = self._train_step(self.state,
                                                          arrays)
                timer.step()

                desc = "training - "
                for k, v in losses.items():
                    val = float(v)
                    if np.isnan(val) and self.cfg.get("halt_on_nan", True):
                        raise FloatingPointError(
                            f"NaN in {k} at epoch {epoch} "
                            f"(batch {batch.attr}); halting — resume from "
                            f"the last checkpoint with is_resume: true")
                    self.losses.setdefault(k, []).append(val)
                    desc += " %s: %.03f" % (k, val)
                desc += " > loss: %.03f" % sum(
                    float(v) for v in losses.values())
                if hasattr(process_bar, "set_description"):
                    process_bar.set_description(desc)
                tb.scalars("train", {k: float(v)
                                     for k, v in losses.items()},
                           global_step)
                tb.scalar("train/loss_total",
                          sum(float(v) for v in losses.values()),
                          global_step)
                if timer.last_rate:
                    tb.scalar("train/steps_per_sec", timer.last_rate,
                              global_step)
                global_step += 1

            metrics_path = join(self.cfg.log_dir, "metrics.npy")
            if os.path.exists(metrics_path):
                best_f1 = float(np.load(metrics_path)[2])
            else:
                best_f1 = 0.0

            if (epoch % self.cfg.get("validation_freq", 1)) == 0:
                metrics = self.run_valid()
                training_record.loc[epoch] = [
                    epoch, metrics["precision"], metrics["recall"],
                    metrics["f1"]]
                tb.scalars("valid", {k: metrics[k] for k in
                                     ("precision", "recall", "f1")},
                           epoch)
                if metrics["f1"] > best_f1:
                    self.save_ckpt(epoch, save_best=True)
                    np.save(metrics_path,
                            np.array([metrics["precision"],
                                      metrics["recall"], metrics["f1"]]))

            if epoch % self.cfg.get("save_ckpt_freq", 5) == 0:
                self.save_ckpt(epoch, save_best=False)

            training_record.to_csv(record_path, index=False)
            if self._preempted:
                self.save_ckpt(epoch, save_best=False)
                log.warning("Preemption checkpoint written for epoch %d; "
                            "stopping", epoch)
                break

        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        tb.close()
        self.wait_for_ckpts()
        return training_record
