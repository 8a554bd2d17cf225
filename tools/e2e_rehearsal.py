"""Full-dress rehearsal of the public CLI surface at flagship scale.

Generates a synthetic forest dataset (40x40x30 m scenes, ~100k points,
tree-trunk columns sized like the anchor priors), writes a config.yaml
with the flagship model (400x400x100 grid, 12 anchors/cell) and
bench-sized static budgets, then drives the REAL entry scripts exactly
as a user would:

    python run_training.py      (2 epochs, ckpt every epoch, eval per epoch)
    python run_testing.py       (resume best ckpt, test_protocol.yaml)

in a scratch working directory, on whatever backend jax selects (the
real TPU chip under axon).  Verifies the artifact set exists and prints
the tail of each log.  Reference surface being rehearsed:
run_training.py:8-24, pipeline/pipeline.py.

    python tools/e2e_rehearsal.py [workdir]
"""

import pathlib
import shutil
import subprocess
import sys
import zlib

import numpy as np
import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent


def write_scene(directory, name, seed, n_trees=25, n_noise=40_000):
    """Disk contract: cloud (N,4) float32; boxes (M,9) z at box CENTER,
    angles in DEGREES, off-origin coordinates."""
    rng = np.random.default_rng(seed)
    pts, boxes = [], []
    for _ in range(n_trees):
        cx, cy = rng.uniform(3.0, 37.0, 2)
        z0 = rng.uniform(0.2, 1.0)          # ground offset
        height = rng.uniform(10.0, 14.0)
        radius = rng.uniform(0.25, 0.45)
        k = rng.integers(1500, 2500)
        ang = rng.uniform(0, 2 * np.pi, k)
        rad = radius * np.sqrt(rng.uniform(0, 1, k))
        z = z0 + height * rng.uniform(0, 1, k) ** 0.7
        trunk = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang),
                          z], -1)
        refl = rng.uniform(0.3, 1.0, (k, 1))
        pts.append(np.concatenate([trunk, refl], -1))
        boxes.append([cx, cy, z0 + height / 2, 2 * radius + 0.1,
                      2 * radius + 0.1, height, 0.0, 0.0,
                      float(rng.uniform(-180, 180))])
    noise = np.concatenate(
        [rng.uniform([0, 0, 0], [40, 40, 25], (n_noise, 3)),
         rng.uniform(0, 0.3, (n_noise, 1))], -1)
    pts.append(noise)
    cloud = np.concatenate(pts).astype(np.float32)
    rng.shuffle(cloud)
    offset = np.array([500.0, 500.0, 100.0, 0.0], np.float32)
    np.save(directory / f"{name}.npy", cloud + offset)
    np.save(directory / f"{name}_bbx.npy",
            np.array(boxes, np.float32)
            + np.array([500, 500, 100, 0, 0, 0, 0, 0, 0], np.float32))


def make_config(root, overfit=False):
    cfg = yaml.safe_load((REPO / "config.yaml").read_text())
    cfg["global_args"]["output_path"] = str(root / "output") + "/"
    cfg["dataset"]["dataset_path"] = str(root / "data") + "/"
    cfg["tpu"]["max_points_static"] = 131_072
    cfg["tpu"]["max_voxels_static"] = 102_400
    cfg["pipeline"].update(max_epoch=2, save_ckpt_freq=1, num_workers=2,
                           validation_freq=1)
    if overfit:
        # learn ONE scene until validation F1 moves off 0: proves the
        # whole CLI stack trains for real (best-ckpt + metrics.npy
        # written live), not just that the plumbing runs.  Step count /
        # lr sized from tests/test_overfit.py (400 steps at 5e-3 reach
        # recall >= 80 at tiny scale); measured at flagship scale:
        # F1 still 0 at step 50, off 0 by step ~75, so 200 steps clear
        # the >0 gate within the script timeout (~10 s/step wall on the
        # 1-vCPU host).
        cfg["pipeline"].update(max_epoch=200, save_ckpt_freq=50,
                               validation_freq=25)
        cfg["pipeline"]["optimizer"]["lr"] = 5e-3
        cfg["model"]["head"]["score_thr"] = 0.05
        cfg["model"]["augment"] = {"PointShuffle": True}
    (root / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))


def run(script, cwd):
    print(f"--- {script} ---", flush=True)
    proc = subprocess.run([sys.executable, str(REPO / script)], cwd=cwd,
                          capture_output=True, text=True, timeout=5400)
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-5000:])
    if proc.returncode != 0:
        raise SystemExit(f"{script} failed rc={proc.returncode}")


def main():
    args = [a for a in sys.argv[1:] if a != "--overfit"]
    overfit = "--overfit" in sys.argv[1:]
    root = pathlib.Path(args[0] if args else "/tmp/e2e_rehearsal")
    if root.exists():
        shutil.rmtree(root)
    if overfit:
        # one scene shared by all three splits
        for split in ("training", "validation", "testing"):
            d = root / "data" / split
            d.mkdir(parents=True)
            write_scene(d, f"{split}_0", seed=7)
    else:
        for split, n in (("training", 6), ("validation", 2),
                         ("testing", 2)):
            d = root / "data" / split
            d.mkdir(parents=True)
            for i in range(n):
                # crc32, not hash(): Python string hashes are salted per
                # process, which would make every rehearsal irreproducible
                seed = zlib.crc32(split.encode()) % 997 + i
                write_scene(d, f"{split}_{i}", seed=seed)
    make_config(root, overfit=overfit)

    run("run_training.py", root)

    # point run_testing at the training run via resume discovery
    cfg = yaml.safe_load((root / "config.yaml").read_text())
    cfg["pipeline"]["inference_mode"] = True
    cfg["pipeline"]["is_resume"] = True
    runs = sorted(p for p in (root / "output").glob("*") if p.is_dir())
    assert runs, "no run directory created"
    cfg["pipeline"]["resume_from"] = runs[-1].name
    (root / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    run("run_testing.py", root)
    run("show_inference.py", root)

    # artifact audit (the reference's full output contract).
    # metrics.npy and ckpt_best are written only when validation F1
    # improves past 0 (pipeline.py, matching reference
    # pipeline/pipeline.py:512-530) — a 2-epoch smoke run may
    # legitimately never produce them, but they must come as a pair.
    rd = runs[-1]
    want = ["process_config.json", "training_record.csv"]
    missing = [w for w in want if not list(rd.rglob(w))]
    ckpts = list(rd.rglob("ckpt_*"))
    protocols = list(rd.rglob("test_protocol.yaml"))
    has_best = [p for p in ckpts if "best" in p.name]
    has_metrics = list(rd.rglob("metrics.npy"))
    print(f"artifacts: missing={missing} ckpts={len(ckpts)} "
          f"protocols={len(protocols)} best={len(has_best)} "
          f"metrics={len(has_metrics)}", flush=True)
    if missing or not ckpts or not protocols:
        raise SystemExit("artifact audit failed")
    if bool(has_best) != bool(has_metrics):
        raise SystemExit("best-ckpt/metrics.npy pairing broken")
    protocol = yaml.safe_load(protocols[0].read_text())
    print(f"test F1: {protocol.get('6_f1')}", flush=True)
    # show_inference's visual artifact: open3d is absent in this image,
    # so the matplotlib fallback must have written a PNG
    pngs = list(rd.rglob("show_inference_*.png"))
    print(f"show_inference PNGs: {len(pngs)}", flush=True)
    if not pngs:
        raise SystemExit("show_inference wrote no visualization PNG")
    if overfit:
        if not (has_best and has_metrics):
            raise SystemExit("overfit run never improved validation F1")
        if not (protocol.get("6_f1") or 0) > 0:
            raise SystemExit("overfit run tested at F1 == 0")
    print("E2E REHEARSAL OK", flush=True)


if __name__ == "__main__":
    main()
