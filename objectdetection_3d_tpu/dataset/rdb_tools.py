"""RIEGL RDBX scanner-format ingestion and export (offline data prep).

Mirrors the surface of reference dataset/RDB_tools.py:8-477: chunked
attribute reads (``RDB_import``), RDBX creation with custom attributes
(``RDB_export``), and bounding-box database handling (``BBX_HANDLER``).
The vendor ``riegl.rdb`` C++ binding is not redistributable; every entry
point degrades with a clear error when it is absent, and the npy/json
conversion helpers below work without it.
"""

import json
import os

import numpy as np


def _require_riegl():
    try:
        import riegl.rdb  # noqa: F401

        return __import__("riegl.rdb", fromlist=["rdb"])
    except ImportError as e:  # pragma: no cover - vendor library
        raise ImportError(
            "riegl.rdb (vendor RDBX binding) is required for RDBX I/O; "
            "install RIEGL's RDB library to use this offline tool") from e


class RDB_import:
    """Chunked RDBX attribute reader (reference dataset/RDB_tools.py:8-88).

    Reads ``riegl.xyz`` plus any further univariate attributes under an
    optional selection condition, returning an (N, 3+A) matrix and the
    file's geo tag.
    """

    def __init__(self, filepath, attributes, condition, chunk_size,
                 only_xyz=False):
        assert isinstance(filepath, str) and os.path.exists(filepath), \
            "RDBX file does not exist"
        assert isinstance(attributes, list) and len(attributes) > 0, \
            "List of attributes has to be a list of strings"
        assert isinstance(condition, str), "Condition has to be a string"
        assert isinstance(chunk_size, int), "chunk_size has to be an int"
        assert isinstance(only_xyz, bool), "only_xyz is a boolean"
        self.path = filepath
        self.attributes = attributes
        self.condition = condition
        self.chunk_size = chunk_size
        self.only_xyz = only_xyz

    def get_features(self):
        rdb_mod = _require_riegl()
        with rdb_mod.rdb.rdb_open(self.path) as rdb:
            xyz_chunks, attr_chunks = [], []
            for points in rdb.select(selection=self.condition,
                                     attributes=self.attributes,
                                     chunk_size=self.chunk_size):
                xyz_chunks.append(np.asarray(points["riegl.xyz"],
                                             np.float64))
                if not self.only_xyz:
                    attr_chunks.append(np.stack(
                        [np.asarray(points[a], np.float64)
                         for a in self.attributes[1:]], axis=-1))
            gtag = rdb.meta_data["riegl.geo_tag"]

        xyz = (np.concatenate(xyz_chunks, 0) if xyz_chunks
               else np.zeros((0, 3)))
        if self.only_xyz:
            return xyz, gtag
        attrs = (np.concatenate(attr_chunks, 0) if attr_chunks
                 else np.zeros((0, len(self.attributes) - 1)))
        return np.concatenate([xyz, attrs], axis=1), gtag


class RDB_export:
    """RDBX writer with custom per-point attributes
    (reference dataset/RDB_tools.py:91-225)."""

    def __init__(self, filepath, attributes, attributes_dtype,
                 attributes_matrix, chunk_size, geo_tag):
        assert isinstance(filepath, str), "Output path has to be a string"
        assert isinstance(attributes, dict) and len(attributes) == 2
        assert isinstance(attributes["BuiltIn"], list) and \
            isinstance(attributes["Custom"], list) and \
            len(attributes["BuiltIn"]) > 0
        assert isinstance(attributes_matrix, np.ndarray) and \
            attributes_matrix.ndim == 2
        assert isinstance(chunk_size, int)
        self.path = filepath
        self.attributes = attributes
        self.attributes_dtype = attributes_dtype
        self.mat = attributes_matrix
        self.chunk_size = chunk_size
        self.gtag = geo_tag

    @staticmethod
    def chunk(mat, n):
        for i in range(0, mat.shape[0], n):
            yield mat[i:i + n, :]

    def create_RDB(self):
        rdb_mod = _require_riegl()
        rdbp = rdb_mod.rdb
        context = rdbp.Context()
        rdb = rdbp.Pointcloud(context)
        settings = rdbp.CreateSettings(context)
        pa = settings.primary_attribute
        pa.name = "riegl.xyz"
        pa.title = "XYZ"
        pa.description = "Cartesian point coordinates"
        pa.unit_symbol = "m"
        pa.length = 3
        pa.resolution = 0.00025
        pa.minimum_value = -535000.0
        pa.maximum_value = +535000.0
        pa.default_value = 0.0
        pa.storage_class = rdbp.PointAttribute.StorageClass.VARIABLE
        settings.chunk_size = 50000
        settings.compression_level = 50
        rdb.create(self.path, settings)

        attr_list = self.attributes["BuiltIn"] + self.attributes["Custom"]
        data_types = {**self.attributes_dtype["BuiltIn"],
                      **self.attributes_dtype["Custom"]}

        with rdbp.Transaction(rdb, "Initialization",
                              "Custom RDBX point cloud featurization"
                              ) as transaction:
            for built_in in self.attributes["BuiltIn"][1:]:
                rdb.point_attributes.add(built_in)
            for custom in self.attributes["Custom"]:
                var = rdbp.PointAttribute(rdb)
                var.name = custom
                var.title = custom
                var.description = f"Feature: {custom}"
                var.unit_symbol = ""
                var.length = 1
                var.resolution = 0.001
                var.minimum_value = -1e5
                var.maximum_value = 1e5
                var.default_value = 0.0
                var.storage_class = rdbp.PointAttribute.StorageClass.VARIABLE
                rdb.point_attributes.add(var)

            with rdb.insert() as insert:
                for chunk in self.chunk(self.mat, self.chunk_size):
                    buffers = rdbp.PointBuffer(rdb, count=chunk.shape[0],
                                               attributes=attr_list)
                    np.copyto(buffers["riegl.xyz"].data, chunk[:, :3])
                    for i, attr in enumerate(attr_list[1:]):
                        np.copyto(buffers[attr].data,
                                  chunk[:, i + 3].astype(data_types[attr]))
                    insert.bind(buffers)
                    insert.next(chunk.shape[0])
                rdb.meta_data.set("riegl.geo_tag", self.gtag)
                transaction.commit()


_BBX_ATTRS = ["riegl.bbx_angle_a", "riegl.bbx_angle_b", "riegl.bbx_angle_c",
              "riegl.bbx_length_a", "riegl.bbx_length_b",
              "riegl.bbx_length_c"]


class BBX_HANDLER:
    """Bounding-box database read/write/insert
    (reference dataset/RDB_tools.py:228-477)."""

    def __init__(self, filepath):
        assert isinstance(filepath, str), "BBX file path has to be a string"
        self.path = filepath

    def _read_raw(self):
        rdb_mod = _require_riegl()
        with rdb_mod.rdb.rdb_open(self.path) as rdb:
            bbx = []
            for points in rdb.select(
                    "", ["riegl.xyz", "riegl.id"] + _BBX_ATTRS[3:]
                    + _BBX_ATTRS[:3], chunk_size=1):
                bbx.append({
                    "id": np.asarray(points["riegl.id"]).squeeze().tolist(),
                    "center": np.asarray(
                        points["riegl.xyz"]).squeeze().tolist(),
                    "length_x": np.asarray(
                        points["riegl.bbx_length_a"]).squeeze().tolist(),
                    "length_y": np.asarray(
                        points["riegl.bbx_length_b"]).squeeze().tolist(),
                    "length_z": np.asarray(
                        points["riegl.bbx_length_c"]).squeeze().tolist(),
                    "angle_x": np.asarray(
                        points["riegl.bbx_angle_a"]).squeeze().tolist(),
                    "angle_y": np.asarray(
                        points["riegl.bbx_angle_b"]).squeeze().tolist(),
                    "angle_z": np.asarray(
                        points["riegl.bbx_angle_c"]).squeeze().tolist(),
                })
        return bbx

    def bbx_json_convert(self):
        bbx_list = self._read_raw()
        out = "{}.json".format(self.path.split(".")[0])
        with open(out, mode="w", encoding="utf-8") as f:
            json.dump(bbx_list, f)

    def collect_bbx_data(self):
        return self._read_raw()

    def create_BBX(self, geo_tag, bbxs):
        rdb_mod = _require_riegl()
        rdbp = rdb_mod.rdb
        context = rdbp.Context()
        rdb = rdbp.Pointcloud(context)
        settings = rdbp.CreateSettings(context)
        pa = settings.primary_attribute
        pa.name = "riegl.xyz"
        pa.title = "XYZ"
        pa.description = "Cartesian point coordinates"
        pa.unit_symbol = "m"
        pa.length = 3
        pa.resolution = 0.00025
        pa.minimum_value = -535000.0
        pa.maximum_value = +535000.0
        pa.default_value = 0.0
        pa.storage_class = rdbp.PointAttribute.StorageClass.VARIABLE
        settings.chunk_size = 100000
        settings.compression_level = 10
        rdb.create(self.path, settings)

        limits = {"angle": (0, 360), "length": (0, 1000)}
        with rdbp.Transaction(rdb, "Initialization",
                              "Bounding boxes of trunks in point cloud"
                              ) as transaction:
            rdb.point_attributes.add("riegl.selected")
            rdb.point_attributes.add("riegl.visible")
            for attr in _BBX_ATTRS:
                var = rdbp.PointAttribute(rdb)
                var.name = attr
                var.title = attr
                kind = "angle" if "angle" in attr else "length"
                var.description = attr
                var.unit_symbol = "deg" if kind == "angle" else "m"
                var.length = 1
                var.resolution = 0.0001 if kind == "angle" else 0.001
                var.minimum_value = limits[kind][0]
                var.maximum_value = limits[kind][1]
                var.default_value = 0.0
                var.storage_class = rdbp.PointAttribute.StorageClass.VARIABLE
                rdb.point_attributes.add(var)
            self._insert(rdb, rdbp, bbxs)
            rdb.meta_data.set("riegl.geo_tag", geo_tag)
            transaction.commit()

    def insert_BBX(self, bbxs, add_filename):
        rdb_mod = _require_riegl()
        rdbp = rdb_mod.rdb
        with rdbp.rdb_open(self.path) as rdb:
            with rdbp.Transaction(
                    rdb, f"Insert of BBX from file: {add_filename}",
                    "BBX_HANDLER.insert_BBX") as transaction:
                self._insert(rdb, rdbp, bbxs)
                transaction.commit()

    @staticmethod
    def _insert(rdb, rdbp, bbxs):
        with rdb.insert() as insert:
            for raw in bbxs:
                chunk = np.array([
                    raw["center"][0], raw["center"][1], raw["center"][2],
                    raw["angle_x"], raw["angle_y"], raw["angle_z"],
                    raw["length_x"], raw["length_y"], raw["length_z"],
                ])
                buffers = rdbp.PointBuffer(
                    rdb, count=1, attributes=["riegl.xyz"] + _BBX_ATTRS)
                np.copyto(buffers["riegl.xyz"].data,
                          chunk[:3].reshape(1, -1))
                order = [3, 4, 5, 6, 7, 8]  # angles then lengths
                for i, attr in enumerate(_BBX_ATTRS):
                    np.copyto(buffers[attr].data,
                              chunk[order[i]].reshape(-1, 1).astype(
                                  np.float64))
                insert.bind(buffers)
                insert.next(1)


# --- npy/json glue (works without riegl.rdb) ---------------------------

def bbx_dicts_to_npy(bbx_list):
    """BBX dicts -> the `_bbx.npy` (M, 9) disk contract
    (x, y, z_center, dx, dy, dz, rx_deg, ry_deg, rz_deg)."""
    rows = []
    for b in bbx_list:
        rows.append(list(b["center"])
                    + [b["length_x"], b["length_y"], b["length_z"],
                       b["angle_x"], b["angle_y"], b["angle_z"]])
    return np.asarray(rows, np.float64).reshape(-1, 9)


def npy_to_bbx_dicts(boxes):
    """(M, 9) disk-contract boxes -> BBX dicts."""
    out = []
    for i, b in enumerate(np.asarray(boxes).reshape(-1, 9)):
        out.append({
            "id": i,
            "center": [float(b[0]), float(b[1]), float(b[2])],
            "length_x": float(b[3]), "length_y": float(b[4]),
            "length_z": float(b[5]),
            "angle_x": float(b[6]), "angle_y": float(b[7]),
            "angle_z": float(b[8]),
        })
    return out
