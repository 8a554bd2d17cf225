"""Export a trained run as a self-contained serving artifact.

The reference's only inference path re-loads a torch pickle inside the
Python pipeline per call (reference pipeline/pipeline.py:132-158); this
tool AOT-compiles the full jitted predict program (voxelize -> network
-> decode -> NMS, weights + anchors baked in) to a StableHLO artifact
via jax.export.  A serving process needs only jax to reload and call it
— no config system, checkpoint format, or this package.

Usage:
    python tools/export_model.py <config.yaml> <out_dir> \
        [--batch N] [--platform tpu|cpu] [--ckpt path]

Reads the config exactly like run_testing.py (inference_mode resume
discovery) unless --ckpt points at a specific checkpoint file.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("out_dir")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platform", default=None,
                    help="lowering platform (default: current backend)")
    ap.add_argument("--ckpt", default=None,
                    help="explicit checkpoint file (else resume "
                         "discovery like run_testing.py)")
    args = ap.parse_args(argv)

    import jax

    from objectdetection_3d_tpu import serving
    from objectdetection_3d_tpu.config import Config
    from objectdetection_3d_tpu.dataset import Forest3D
    from objectdetection_3d_tpu.models import PointPillars
    from objectdetection_3d_tpu.pipeline import ObjectDetection
    from objectdetection_3d_tpu.pipeline import checkpoint as ckpt_io

    cfg = Config.load_from_file(args.config)
    global_cfg = cfg.dump()
    cfg_dataset, cfg_pipeline, cfg_model = Config.initialize_params(cfg)
    model = PointPillars(**cfg_model)

    if args.ckpt:
        payload = ckpt_io.load_ckpt(args.ckpt)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
    else:
        dataset = Forest3D(**cfg_dataset)
        pipeline = ObjectDetection(model, dataset, global_cfg,
                                   **cfg_pipeline)
        state = pipeline.load_ckpt()
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}

    platforms = [args.platform] if args.platform else None
    blob, manifest = serving.export_predict(
        model, variables, batch_size=args.batch, platforms=platforms)
    serving.save_exported(blob, manifest, args.out_dir)
    print(f"export_model: wrote {len(blob)} payload bytes to "
          f"{args.out_dir} (platforms={manifest['platforms']}, "
          f"batch={manifest['batch_size']}, "
          f"points={manifest['inputs']['points'][0]})")
    print("reload with: objectdetection_3d_tpu.serving.load_serving(dir)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
