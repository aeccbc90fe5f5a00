"""Verify the bucket-padding exactness of the masked eval path.

The bucketed eval pads images to a shape multiple of 128 and passes a
pixel mask. Attention and positional encodings are exact under the mask,
and the backbone applies per-conv validity masking with conv-arithmetic
valid extents (models/resnet.py, layers.feature_valid_mask), so the
padded+mask forward should equal a genuinely-unpadded forward (the
reference's protocol, /root/reference/eval.py:41-58) to fp32 noise.
This probe measures the end-to-end deltas with a real DETR-R50 (random
weights) across aspect ratios:

  * max abs delta on pred_logits and pred_boxes
    (padded+mask vs exact-shape forward);
  * the effect on post-softmax scores.

Expected: ~1e-6. Run on CPU (slow, exact) or TPU. Results are documented
in docs/evaluation.md.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from detr_tensorflow_tpu.models import DETR

    model = DETR(num_classes=92, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(0)

    shapes = [(480, 640), (426, 640), (500, 375), (612, 612), (327, 500)]
    print("shape      padded     max|dlogit|  max|dbox|  max|dscore|")
    worst = 0.0
    for h, w in shapes:
        ph = ((h + 127) // 128) * 128
        pw = ((w + 127) // 128) * 128
        img = np.asarray(rng.normal(size=(1, h, w, 3)), np.float32)
        padded = np.zeros((1, ph, pw, 3), np.float32)
        padded[:, :h, :w] = img
        mask = np.zeros((1, ph, pw), bool)
        mask[:, :h, :w] = True

        t0 = time.time()
        out_exact = jax.jit(model.apply)(variables, jnp.asarray(img))
        out_pad = jax.jit(model.apply)(
            variables, jnp.asarray(padded), pixel_mask=jnp.asarray(mask)
        )
        logit_e = np.asarray(out_exact["pred_logits"], np.float32)
        logit_p = np.asarray(out_pad["pred_logits"], np.float32)
        box_e = np.asarray(out_exact["pred_boxes"], np.float32)
        box_p = np.asarray(out_pad["pred_boxes"], np.float32)

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        d_log = float(np.abs(logit_e - logit_p).max())
        d_box = float(np.abs(box_e - box_p).max())
        d_score = float(np.abs(softmax(logit_e) - softmax(logit_p)).max())
        worst = max(worst, d_score)
        print(
            f"{h}x{w:<5} -> {ph}x{pw:<5} {d_log:11.2e} {d_box:10.2e} "
            f"{d_score:11.2e}   ({time.time() - t0:.0f}s)"
        )
    print(f"\nworst post-softmax score delta: {worst:.2e}")


if __name__ == "__main__":
    main()
