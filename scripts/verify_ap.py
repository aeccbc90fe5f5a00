"""One-command AP-36.53 verification, the moment real weights exist.

The reference's entire QA story is the published COCO val2017 AP table
(/root/reference/README.md:85-89) produced by its eval.py with the
downloadable DETR-R50 checkpoint. This build environment has no network
egress, so the checkpoint cannot be fetched here — but everything else
is staged: given ANY local copy of the weights (facebook
``detr-r50-e632da11.pth`` or a HuggingFace ``DetrForObjectDetection``
state_dict) this script converts them, runs the bucketed-masked eval on
COCO val2017, and diffs the resulting AP table against the reference's
published numbers.

Usage:
  python scripts/verify_ap.py --weights /path/detr-r50-e632da11.pth \
      --data_dir /path/coco --img_dir val2017 \
      --ann_file annotations/instances_val2017.json [--limit N]
      [--tolerance 0.5]

or, on a machine WITH egress, one command end to end:

  python scripts/verify_ap.py --download --data_dir /path/coco

(--download resolves "detr" via the checksum-gated registry in
models/weights.py:PRETRAINED_CHECKPOINTS and fails fast without
egress.)

Exit code 0 iff every threshold's box AP is within --tolerance points of
the published table.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Published table: reference README.md:85-89 (box AP x100 per IoU).
# Keys match MeanAPEvaluator.compute(): "all" or int(threshold * 100).
REFERENCE_AP = {
    "all": 36.53, 50: 55.38, 55: 53.13, 60: 50.46, 65: 47.11,
    70: 43.07, 75: 38.11, 80: 32.10, 85: 25.01, 90: 16.20,
    95: 4.77,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default="detr",
                        help=".pth/.bin torch checkpoint, converted .npz, "
                             "or a registry short name (detr, detr-r50, "
                             "detr-r101)")
    parser.add_argument("--download", action="store_true",
                        help="fetch the registered checkpoint from its "
                             "public URL when no local copy exists "
                             "(checksum-gated; requires egress)")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--img_dir", default="val2017")
    parser.add_argument("--ann_file",
                        default="annotations/instances_val2017.json")
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate only the first N images (smoke mode)")
    parser.add_argument("--tolerance", type=float, default=0.5,
                        help="allowed |AP - published| in points")
    parser.add_argument("--exact_shapes", action="store_true",
                        help="compile per image shape instead of "
                             "bucket-padding (reference protocol, slower)")
    args = parser.parse_args()

    from eval import eval_model
    from detr_tensorflow_tpu.data import load_coco_dataset
    from detr_tensorflow_tpu.models import get_detr_model
    from detr_tensorflow_tpu.train import DataConfig, TrainingConfig

    config = TrainingConfig(
        data=DataConfig(data_dir=args.data_dir, img_dir=args.img_dir,
                        ann_file=args.ann_file),
    )
    weights = args.weights
    if args.download:
        from detr_tensorflow_tpu.models.weights import download_weights
        weights = download_weights(args.weights)
    model = get_detr_model(config, include_top=True, weights=weights)
    valid_dt, class_names = load_coco_dataset(
        config, 1, augmentation=None, shuffle=False,
        bucket_divisor=1 if args.exact_shapes else 128,
    )
    config = config.replace(background_class=valid_dt.background_class)
    if args.limit is not None:
        base_iter = valid_dt.__iter__

        def limited():
            for i, b in enumerate(base_iter()):
                if i >= args.limit:
                    break
                yield b

        valid_dt = limited()

    table = eval_model(model, config, class_names, valid_dt)

    # table: {"box": {"all"|int(thr*100): AP x100}} from print_table.
    box = table["box"]
    print("\nthreshold   ours   published   delta")
    ok = True
    for key, ref in REFERENCE_AP.items():
        ours = box.get(key)
        if ours is None:
            continue
        delta = ours - ref
        flag = "" if abs(delta) <= args.tolerance else "  <-- OUT OF TOLERANCE"
        if abs(delta) > args.tolerance:
            ok = False
        print(f"{str(key):>9}  {ours:6.2f}     {ref:6.2f}   {delta:+6.2f}{flag}")
    if args.limit is not None:
        print(f"\n(smoke mode: only {args.limit} images — deltas not "
              "meaningful, checking the pipeline runs)")
        sys.exit(0)
    print("\nVERDICT:", "PASS" if ok else "FAIL",
          f"(tolerance {args.tolerance} AP points)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
