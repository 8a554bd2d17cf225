"""Train-time point-cloud augmentation (host side).

Mirrors reference augment/augmentation.py:6-220: a base class of generic
cloud transforms plus the object-detection augmentor that applies a
configured subset in fixed order.  The active reference config enables only
``PointShuffle`` (config.yaml:69-72).
"""

import warnings

import numpy as np

from objectdetection_3d_tpu.augment import numpy_ops as npo


class Augmentation:
    """Common augmentation methods (reference augment/augmentation.py:6-133)."""

    def __init__(self, cfg, seed=None):
        self.cfg = cfg or {}
        self.rng = np.random.default_rng(seed)

    def recenter(self, data, cfg):
        if not cfg:
            return data
        dim = cfg.get("dim", [0, 1, 2]) if isinstance(cfg, dict) else [0, 1, 2]
        data = data.copy()
        data[:, dim] = data[:, dim] - data.mean(0)[dim]
        return data

    def normalize(self, pc, feat, cfg):
        if "points" in cfg:
            cfg_p = cfg["points"]
            if cfg_p.get("method", "linear") == "linear":
                pc = pc - pc.mean(0)
                pc = pc / (pc.max(0) - pc.min(0)).max()
            else:
                raise ValueError(
                    f"Unsupported method : {cfg_p.get('method')}")
        if "feat" in cfg and feat is not None:
            cfg_f = cfg["feat"]
            if cfg_f.get("method", "linear") == "linear":
                feat = (feat - cfg_f.get("bias", 0)) / cfg_f.get("scale", 1)
            else:
                raise ValueError(
                    f"Unsupported method : {cfg_f.get('method')}")
        return pc, feat

    def rotate(self, pc, cfg):
        """Random yaw ('vertical') or uniform SO(3) ('all') rotation."""
        if np.abs(pc[:, :2].mean()) > 1e-2:
            warnings.warn(
                "It is recommended to recenter the pointcloud before "
                "calling rotate.")
        method = cfg.get("method", "vertical")
        if method == "vertical":
            theta = self.rng.random() * 2 * np.pi
            c, s = np.cos(theta), np.sin(theta)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                           dtype=np.float32)
        elif method == "all":
            theta = self.rng.random() * 2 * np.pi
            phi = (self.rng.random() - 0.5) * np.pi
            u = np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                np.sin(phi),
            ])
            alpha = self.rng.random() * 2 * np.pi
            rot = npo.create_3D_rotations(
                u.reshape(1, -1), np.reshape(alpha, (1,)))[0]
        else:
            raise ValueError(f"Unsupported method : {method}")
        return np.matmul(pc, rot.astype(np.float32))

    def scale(self, pc, cfg):
        anisotropic = cfg.get("scale_anisotropic", False)
        min_s = cfg.get("min_s", 1.0)
        max_s = cfg.get("max_s", 1.0)
        if anisotropic:
            factor = self.rng.random(pc.shape[1]) * (max_s - min_s) + min_s
        else:
            factor = self.rng.random() * (max_s - min_s) + min_s
        return pc * factor

    def noise(self, pc, cfg):
        noise_std = cfg.get("noise_std", 0.001)
        noise = (self.rng.standard_normal(pc.shape) * noise_std).astype(
            np.float32)
        return pc + noise

    def augment(self, data):
        raise NotImplementedError(
            "Please use ObjdetAugmentation.")


class ObjdetAugmentation(Augmentation):
    """Object-detection augmentor (reference augment/augmentation.py:136-220)."""

    ALL_METHODS = [
        "recenter", "normalize", "rotate", "scale", "noise", "PointShuffle",
        "ObjectRangeFilter", "ObjectSample",
    ]

    def __init__(self, cfg, seed=None):
        super().__init__(cfg, seed=seed)
        for method in (cfg or {}):
            if method not in self.ALL_METHODS:
                warnings.warn(
                    f"Augmentation method : {method} does not exist. "
                    "Please verify!")

    def PointShuffle(self, data):
        data["point"] = npo.point_shuffle(data["point"], self.rng)
        return data

    @staticmethod
    def in_range(pcd_range, corners):
        return ((corners[:, 0].min() > pcd_range[0])
                & (corners[:, 0].max() < pcd_range[3])
                & (corners[:, 1].min() > pcd_range[1])
                & (corners[:, 1].max() < pcd_range[4])
                & (corners[:, 2].min() > pcd_range[2])
                & (corners[:, 2].max() < pcd_range[5]))

    def ObjectRangeFilter(self, data, pcd_range):
        """Keep only boxes whose rotated corners stay inside the range."""
        pcd_range = np.array(pcd_range)
        filtered = [
            box for box in data["bboxes"]
            if self.in_range(pcd_range, npo.bbox2corners3D_np(box))
        ]
        return {
            "point": data["point"],
            "labels": data["labels"],
            "bboxes": np.array(filtered).reshape(-1, 9)
            if len(filtered) else np.zeros((0, 9), np.float32),
        }

    def augment(self, data, attr, seed=None):
        cfg = self.cfg
        if cfg is None:
            return data
        if seed is not None:
            # per-worker override for reproducibility with parallel loading
            self.rng = np.random.default_rng(seed)

        if cfg.get("recenter"):
            data["point"] = self.recenter(data["point"], cfg["recenter"])
        if "normalize" in cfg:
            data["point"], _ = self.normalize(data["point"], None,
                                              cfg["normalize"])
        if "rotate" in cfg:
            data["point"] = self.rotate(data["point"], cfg["rotate"])
        if "scale" in cfg:
            data["point"] = self.scale(data["point"], cfg["scale"])
        if cfg.get("ObjectRangeFilter", False):
            data = self.ObjectRangeFilter(
                data, cfg["ObjectRangeFilter"]["point_cloud_range"])
        if cfg.get("PointShuffle", False):
            data = self.PointShuffle(data)
        return data
