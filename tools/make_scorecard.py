"""Extract the pinned trained-model scorecard + bench checkpoint artifact.

Reads a completed overfit-rehearsal run directory
(``tools/e2e_rehearsal.py --overfit``), then writes:

* ``artifacts/overfit_ckpt.npz`` — {params, batch_stats, score_thr,
  provenance}: the best-F1 checkpoint stripped of its optimizer state so
  ``bench.py`` can drive the tiled large-scene section with REAL
  detections (VERDICT r3 weak #3).
* ``SCORECARD.md`` — the committed regression anchor recording the
  synthetic-forest training outcome (P/R/F1 per split), the analog of the
  reference's ``test_protocol.yaml`` scoreboard
  (reference pipeline/pipeline.py:317-328).

Run: ``python tools/make_scorecard.py /tmp/e2e_overfit``
"""

import pathlib
import json
import pickle
import sys

import numpy as np
import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                        else "/tmp/e2e_overfit")
    runs = sorted(p for p in (root / "output").glob("*") if p.is_dir())
    assert runs, f"no run directories under {root}/output"
    rd = runs[-1]

    best = list(rd.rglob("ckpt_best.pkl"))
    assert best, "no best checkpoint — the overfit run never learned"
    with open(best[0], "rb") as f:
        ckpt = pickle.load(f)
    state = ckpt["state"] if "state" in ckpt else ckpt
    cfg = yaml.safe_load((root / "config.yaml").read_text())
    score_thr = float(cfg["model"]["head"]["score_thr"])

    (REPO / "artifacts").mkdir(exist_ok=True)
    # npz with flat a/b/c keys, not pickle: the committed artifact must
    # not be code-execution-on-load (bench.load_trained_ckpt unflattens)
    out_ckpt = REPO / "artifacts" / "overfit_ckpt.npz"
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + (k,), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(("params",), state["params"])
    walk(("batch_stats",), state["batch_stats"])
    flat["score_thr"] = np.float32(score_thr)
    flat["provenance"] = np.asarray(json.dumps({
        "run_dir": str(rd),
        "epoch": int(ckpt.get("epoch", -1)),
        "recipe": "tools/e2e_rehearsal.py --overfit "
                  "(synthetic forest, one scene, 200 epochs, "
                  "lr 5e-3, score_thr %.2f)" % score_thr,
    }))
    np.savez_compressed(out_ckpt, **flat)
    print(f"wrote {out_ckpt} "
          f"({out_ckpt.stat().st_size / 1e6:.1f} MB, "
          f"epoch {ckpt.get('epoch')})")

    protocols = list(rd.rglob("test_protocol.yaml"))
    assert protocols, "run_testing never wrote test_protocol.yaml"
    protocol = yaml.safe_load(protocols[0].read_text())

    record = np.genfromtxt(list(rd.rglob("training_record.csv"))[0],
                           delimiter=",")
    record = np.atleast_2d(record)
    best_row = record[np.nanargmax(record[:, 3])]

    scorecard = f"""# SCORECARD — pinned trained-model regression anchor

Produced by `tools/e2e_rehearsal.py --overfit` on the REAL TPU chip
(axon v5e-1) through the public CLI surface (`run_training.py` ->
`run_testing.py`), on the synthetic single-scene forest dataset
(25 trunk columns + 40k noise points, 40x40x30 m, seed 7).  This is the
"does the stack LEARN end-to-end" anchor: random init scores F1 = 0 on
this data; the numbers below must be reproducible to within noise by
re-running the recipe.

Recipe: 200 epochs, AdamW lr 5e-3, grad value clip 2.0, score_thr
{score_thr}, flagship architecture (400x400x100 grid, 12 anchors/cell,
1.92M anchors), PointShuffle augmentation only.

| quantity | value |
|---|---|
| best validation epoch | {int(best_row[0])} |
| best validation precision | {best_row[1]:.2f}% |
| best validation recall | {best_row[2]:.2f}% |
| best validation F1 | {best_row[3]:.2f} |
| test precision (`run_testing`, best ckpt) | {protocol.get('4_precision')} |
| test recall | {protocol.get('5_recall')} |
| test F1 | {protocol.get('6_f1')} |

Artifacts: `artifacts/overfit_ckpt.npz` carries the best-F1 params +
batch_stats (optimizer state stripped); `bench.py` loads it for the
tiled large-scene section so the global NMS merge processes real
detections (BASELINE.json config #5).

Provenance: run dir `{rd.name}`, checkpoint epoch
{ckpt.get('epoch')}, written {protocols[0].parent.name}.
Full eval protocol:

```yaml
{yaml.safe_dump(protocol, sort_keys=True).strip()}
```
"""
    (REPO / "SCORECARD.md").write_text(scorecard)
    print(f"wrote {REPO / 'SCORECARD.md'}")
    print(f"test F1: {protocol.get('6_f1')}")


if __name__ == "__main__":
    main()
