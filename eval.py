"""Evaluate a (pretrained) DETR model on COCO val2017.

Workflow parity with the reference ``eval.py``: pretrained model with
its published heads, batch-1 original-size evaluation (augmentation
None), yxyx boxes, ASCII AP table — target box AP 36.53 (reference
README.md:85-89, BASELINE.md).

TPU-native differences: images are bucket-padded to static shapes with a
pixel mask (bounded compile count instead of per-shape retraces), the
forward is jitted, the AP bookkeeping is the vectorized evaluator, and
``--batch N`` scores whole shape-bucketed batches per device program
(identical AP to batch 1 — padding invariance is exact and the AP math
is per-image; the 5000-image val set stops wasting ~an order of
magnitude of chip throughput).
With ``--masks`` the instance-segmentation head runs too and the mask AP
row is real (the reference's is a zero placeholder, eval.py:54).

Usage:
  python eval.py --data_dir /path/coco --img_dir val2017 \
      --ann_file annotations/instances_val2017.json
"""

import numpy as np

from detr_tensorflow_tpu import inference
from detr_tensorflow_tpu.data import load_coco_dataset
from detr_tensorflow_tpu.metrics import MeanAPEvaluator
from detr_tensorflow_tpu.models import get_detr_model
from detr_tensorflow_tpu.ops import boxes as bbox_ops
from detr_tensorflow_tpu.train import TrainingConfig, training_config_parser


def build_model(config, masks: bool = False):
    """Pretrained DETR-R50 with its COCO heads (reference eval.py:20-27)."""
    return get_detr_model(config, include_top=True, weights="detr", masks=masks)


def eval_model(model, config, class_names, valid_dt, report_pq: bool = False,
               mask_lattice: str = "full", stuff_classes=None,
               protocol: str = "reference"):
    """mask_lattice:
      * "full" (COCO protocol, default): predicted masks are cropped to
        the valid stride-4 region, bilinearly upsampled to the original
        image frame and thresholded; GT masks are scored at full
        resolution (``t_masks_full``). Mask AP / PQ are comparable to
        published numbers' protocol.
      * "stride4": fast path — both sides on the padded stride-4
        lattice (no resampling; round-2 behavior). Not comparable to
        pycocotools numbers for small objects.
    """
    import jax
    import jax.numpy as jnp

    background = int(config.background_class)

    def _post(outputs, pixel_mask):
        post = inference.postprocess(outputs, background, "yxyx")
        if "pred_masks" not in outputs:
            return post, None, None
        probs = jax.nn.sigmoid(outputs["pred_masks"].astype(jnp.float32))
        if pixel_mask is not None:
            from detr_tensorflow_tpu.models.layers import feature_valid_mask

            _, _, h4, w4 = probs.shape
            valid4 = feature_valid_mask(pixel_mask, h4, w4)
            probs = probs * valid4[:, None]
        seg_map = None
        if report_pq:  # stride-4 merge; unused when full-res GT exists
            seg_map, _ = inference.merge_instance_masks(outputs, background)
        return post, probs, seg_map

    # One fused XLA program per bucket shape: forward + postprocess.
    @jax.jit
    def run(variables, images, pixel_mask):
        outputs = model.module.apply(variables, images, pixel_mask=pixel_mask)
        return _post(outputs, pixel_mask)

    @jax.jit
    def run_nomask(variables, images):
        outputs = model.module.apply(variables, images)
        return _post(outputs, None)

    evaluator = MeanAPEvaluator(num_classes=len(class_names), class_names=class_names)
    coco_ev = None
    if protocol == "cocoeval":
        # Parallel accumulation under the pycocotools convention
        # (metrics/coco_protocol.py) — box AP only; measured to agree
        # with the reference protocol exactly on crowd-free, <=100-det
        # data (tests/test_coco_protocol.py).
        from detr_tensorflow_tpu.metrics import COCOProtocolEvaluator

        coco_ev = COCOProtocolEvaluator(num_classes=len(class_names))
    pq_pred_maps, pq_pred_labels, pq_gt_masks, pq_gt_classes = [], [], [], []
    pq_gt_crowd, pq_void = [], []
    for it, batch in enumerate(valid_dt):
        if "pixel_mask" in batch:
            (boxes_, labels_, scores_, keep_), probs_, seg_ = run(
                model.variables, batch["images"], batch["pixel_mask"]
            )
        else:
            (boxes_, labels_, scores_, keep_), probs_, seg_ = run_nomask(
                model.variables, batch["images"]
            )
        # Batched eval (eval.py --batch N): one device program scores
        # the whole shape-bucketed batch; the per-image AP bookkeeping
        # below loops host-side. batch_valid masks the repeat-padding
        # of the final partial batch (data/pipeline.py pad_remainder).
        bvalid = batch.get(
            "batch_valid", np.ones(batch["images"].shape[0], bool)
        )
        for bi in np.nonzero(bvalid)[0]:
            keep0 = np.asarray(keep_[bi])
            p_bbox = np.asarray(boxes_[bi])[keep0]
            p_labels = np.asarray(labels_[bi])[keep0]
            p_scores = np.asarray(scores_[bi])[keep0]
            n = int(batch["mask"][bi].sum())
            t_yxyx = np.asarray(
                bbox_ops.np_yxyx_to_xyxy(  # involutive: xyxy->yxyx
                    bbox_ops.np_xcycwh_to_xyxy(batch["boxes"][bi][:n])
                )
            )
            if "pixel_mask" in batch:
                pm0 = np.asarray(batch["pixel_mask"][bi])
                orig_h = int(pm0[:, 0].sum())
                orig_w = int(pm0[0, :].sum())
            else:
                orig_h, orig_w = batch["images"].shape[1:3]
            p_masks = t_masks = None
            gt_masks_full = None
            use_full = mask_lattice == "full" and "t_masks_full" in batch
            if probs_ is not None and "t_masks" in batch:
                if use_full:
                    # COCO protocol: score at original image resolution.
                    # Only the kept (non-background) queries are
                    # upsampled — both AP and the panoptic merge ignore
                    # the rest, and the host-side bilinear over 100
                    # full-res channels is the eval loop's dominant
                    # cost otherwise.
                    sel = np.nonzero(keep0)[0]
                    up = inference.upsample_mask_probs(
                        np.asarray(probs_[bi])[sel], (orig_h, orig_w)
                    )  # (H, W, n_kept)
                    p_masks = up > 0.5
                    gt_masks_full = (
                        batch["t_masks_full"][bi][:n, :orig_h, :orig_w] > 0
                    )
                    t_masks = gt_masks_full.transpose(1, 2, 0)
                    if report_pq:
                        seg_full = inference.np_merge_full_res(
                            up, np.asarray(scores_[bi])[sel],
                            np.ones(len(sel), bool),
                        ) if len(sel) else np.full(
                            (orig_h, orig_w), -1, np.int32
                        )
                        pq_pred_maps.append(seg_full)
                        pq_pred_labels.append(np.asarray(labels_[bi])[sel])
                        pq_gt_masks.append(gt_masks_full)
                        pq_gt_classes.append(
                            np.asarray(batch["classes"][bi][:n])
                        )
                        pq_gt_crowd.append(
                            np.asarray(batch["gt_is_crowd"][bi])[:n]
                            if "gt_is_crowd" in batch else None
                        )
                        pq_void.append(
                            np.asarray(batch["void_mask"][bi])
                            [:orig_h, :orig_w]
                            if "void_mask" in batch else None
                        )
                else:
                    # Prediction and target masks live on the identical
                    # padded stride-4 lattice (data/processing.py) — IoU
                    # needs no resize.
                    p_masks = (
                        np.asarray(probs_[bi])[keep0].transpose(1, 2, 0)
                        > 0.5
                    )
                    t_masks = batch["t_masks"][bi][:n].transpose(1, 2, 0)
            evaluator.add_image(
                p_bbox, p_labels, p_scores, t_yxyx,
                batch["classes"][bi][:n],
                p_masks=p_masks, t_masks=t_masks,
            )
            if coco_ev is not None:
                coco_ev.add_image(
                    p_bbox, p_labels, p_scores, t_yxyx,
                    batch["classes"][bi][:n],
                )
            if (report_pq and seg_ is not None and t_masks is not None
                    and not use_full):
                pq_pred_maps.append(np.asarray(seg_[bi]))
                pq_pred_labels.append(np.asarray(labels_[bi]))
                pq_gt_masks.append(t_masks.transpose(2, 0, 1).astype(bool))
                pq_gt_classes.append(np.asarray(batch["classes"][bi][:n]))
                pq_gt_crowd.append(None)
                pq_void.append(None)
        print(f"Computing map.....{it}", end="\r")
    table = evaluator.print_table()
    if coco_ev is not None:
        ct = coco_ev.compute()["box"]
        print("cocoeval-protocol box AP: "
              + "  ".join(f"{k}: {v:5.2f}" for k, v in ct.items()))
        table["box_cocoeval"] = ct
    if report_pq and pq_pred_maps:
        from detr_tensorflow_tpu.metrics import panoptic_quality

        pq = panoptic_quality(
            pq_pred_maps, pq_pred_labels, pq_gt_masks, pq_gt_classes,
            gt_iscrowd=pq_gt_crowd, void_masks=pq_void,
            stuff_classes=stuff_classes,
        )
        print(
            f"       |  PQ: {100 * pq['pq']:.2f}  |  SQ: {100 * pq['sq']:.2f}"
            f"  |  RQ: {100 * pq['rq']:.2f}  | ({pq['n_classes']} classes)"
        )
        if stuff_classes is not None:
            th, st = pq["things"], pq["stuff"]
            print(
                f"       |  PQ^th: {100 * th['pq']:.2f} ({th['n_classes']})"
                f"  |  PQ^st: {100 * st['pq']:.2f} ({st['n_classes']})"
            )
        table["pq"] = pq
    return table


if __name__ == "__main__":
    parser = training_config_parser()
    parser.add_argument(
        "--batch", type=int, default=1,
        help="evaluation batch size. 1 (default) is the reference's "
             "protocol (eval.py:41-58); N>1 groups val images by "
             "padding bucket and scores each static-shape batch in one "
             "device program — identical AP (the masked forward is "
             "exactly padding-invariant and the AP math is per-image), "
             "~Nx the chip throughput. Incompatible with "
             "--exact_shapes.",
    )
    parser.add_argument(
        "--exact_shapes", action="store_true",
        help="compile per exact image shape instead of bucket-padding — "
             "the reference's protocol (eval.py:41-58). The padded+mask "
             "forward is exactly padding-invariant (per-conv validity "
             "masking, models/resnet.py; deltas at fp32 noise — "
             "scripts/padding_error_probe.py), so this flag only trades "
             "compile count for identical numbers.",
    )
    parser.add_argument(
        "--masks", action="store_true",
        help="run the instance-segmentation head and score a real mask "
             "AP row (the reference's is a zero placeholder).",
    )
    parser.add_argument(
        "--mask_lattice", choices=["full", "stride4"], default="full",
        help="'full' (default): COCO protocol — mask IoU at original "
             "image resolution (predictions bilinearly upsampled from "
             "stride 4, GT at full res). 'stride4': fast path on the "
             "stride-4 lattice (NOT comparable to published numbers).",
    )
    parser.add_argument(
        "--pq", action="store_true",
        help="with --masks: also report Panoptic Quality (PQ/SQ/RQ) over "
             "the panoptic pixel-argmax merge (metrics/pq.py).",
    )
    parser.add_argument(
        "--panoptic_ann", default=None,
        help="path to a COCO panoptic_*.json — switches --pq to the "
             "published panoptic protocol: things+stuff segments, crowd "
             "and VOID handling (Kirillov et al.; DETR paper PQ 43.4). "
             "Without it --pq scores a things-only internal PQ.",
    )
    parser.add_argument(
        "--panoptic_png_dir", default=None,
        help="directory of panoptic segment-id PNGs (defaults to the "
             "annotation path without .json, the COCO convention).",
    )
    parser.add_argument(
        "--protocol", choices=["reference", "cocoeval"],
        default="reference",
        help="'reference' (default): the Yolact-greedy AP protocol the "
             "reference ships (compute_map.py). 'cocoeval': ALSO report "
             "box AP under the pycocotools COCOeval convention "
             "(metrics/coco_protocol.py) — the convention published "
             "detection numbers use. tests/test_coco_protocol.py "
             "measures the delta: zero on crowd-free data with <=100 "
             "detections/image.",
    )
    parser.add_argument(
        "--paper_protocol", action="store_true",
        help="DETR-paper eval resize (shortest side 800, max 1333) — the "
             "protocol behind the paper's AP 42.0; the reference carries "
             "it only as disabled code (transformation.py:96-112). "
             "Default is the reference's original-size protocol "
             "(AP 36.53).",
    )
    args = parser.parse_args()
    if args.batch > 1 and args.exact_shapes:
        parser.error("--batch N>1 requires bucket padding; drop "
                     "--exact_shapes")
    if args.batch > 1 and args.panoptic_ann and args.pq:
        parser.error("panoptic eval is batch-1 (ragged full-res ground "
                     "truth); drop --batch")
    config = TrainingConfig().update_from_args(args)

    detr = build_model(config, masks=args.masks)
    stuff_classes = None
    if args.panoptic_ann and args.pq:
        from detr_tensorflow_tpu.data.panoptic import load_coco_panoptic

        valid_dt, class_names = load_coco_panoptic(
            config, args.batch, ann_file=args.panoptic_ann,
            png_dir=args.panoptic_png_dir,
            bucket_divisor=1 if args.exact_shapes else 128,
        )
        stuff_classes = valid_dt.stuff_classes
    else:
        valid_dt, class_names = load_coco_dataset(
            config, args.batch, augmentation=None,
            bucket_divisor=1 if args.exact_shapes else 128,
            include_masks=args.masks,
            paper_protocol=(800, 1333) if args.paper_protocol else None,
            full_res_masks=args.masks and args.mask_lattice == "full",
        )
    config = config.replace(background_class=valid_dt.background_class)
    eval_model(detr, config, class_names, valid_dt,
               report_pq=args.pq and args.masks,
               mask_lattice=args.mask_lattice,
               stuff_classes=stuff_classes,
               protocol=args.protocol)
