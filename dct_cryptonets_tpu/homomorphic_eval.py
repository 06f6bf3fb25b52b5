"""Homomorphic evaluation entry point.

Mirrors the reference ``homomorphic_eval.py`` flow (reference
homomorphic_eval.py:89-443): load checkpoint -> calibrate -> compile the
*trunk* to an FHE circuit (classifier stays clear) -> feasibility check
(max bit-width <= 16) -> keygen -> clear eval -> simulate eval ->
execute eval -> reliability sweep over seeded test subsets.

Run (simulate, synthetic smoke):
  python -m dct_cryptonets_tpu.homomorphic_eval --dataset synthetic \
      --dct_status --model ResNet20qat --channels 24 --filter_size 4 \
      --image_size_dct 16 --test_subset 16 --fhe_mode simulate
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import parse_args
from .data import pipeline
from .data.codec import CodecConfig, dct_ingest
from .fhe.runtime import compile_ptq_model, compile_qat_model
from .models import build_spec, calibrate_scales, forward, init_model
from .utils import AverageMeter, topk_accuracy


def _ingest(images, codec_cfg):
    if codec_cfg is None:
        mean = jnp.asarray([0.4914, 0.4822, 0.4465]) * 255.0
        std = jnp.asarray([0.2023, 0.1994, 0.2010]) * 255.0
        return (jnp.asarray(images, jnp.float32) - mean) / std
    return dct_ingest(jnp.asarray(images), codec_cfg)


def test_unencrypted(params, state, spec, codec_cfg, ds, idx, batch):
    top1, top5 = AverageMeter(), AverageMeter()
    for images, labels in pipeline.batches(ds, idx, batch, shuffle=False,
                                           drop_remainder=False):
        x = _ingest(images, codec_cfg)
        _, logits, _ = forward(params, state, x, spec, train=False)
        p1, p5 = topk_accuracy(np.asarray(logits), labels)
        top1.update(p1, len(labels))
        top5.update(p5, len(labels))
    return top1, top5


def test_encrypted(module, clf_w, clf_b, codec_cfg, ds, idx, batch, fhe_mode,
                   drop_limbs=0):
    """Encrypted-trunk + clear-classifier eval (reference
    homomorphic_eval.py:60-86)."""
    top1, top5 = AverageMeter(), AverageMeter()
    for images, labels in pipeline.batches(ds, idx, batch, shuffle=False,
                                           drop_remainder=False):
        x = np.asarray(_ingest(images, codec_cfg))
        feats = module.forward(x, fhe=fhe_mode, drop_limbs=drop_limbs)
        logits = feats @ clf_w + clf_b
        p1, p5 = topk_accuracy(logits, labels)
        top1.update(p1, len(labels))
        top5.update(p5, len(labels))
    return top1, top5


def main(argv=None):
    cfg = parse_args("homomorphic_eval", argv)
    if getattr(cfg, "profile_dir", None):
        import jax.profiler as _prof
        opts = _prof.ProfileOptions()
        # host-only: device trace collection hangs through the axon tunnel
        opts.advanced_configuration = {"device_tracer_level": 0}
        with _prof.trace(cfg.profile_dir, profiler_options=opts):
            cfg.profile_dir = None
            return main_impl(cfg)
    return main_impl(cfg)


def main_impl(cfg):
    img = cfg.image_size_dct if cfg.dct_status else cfg.image_size
    in_ch = cfg.channels if cfg.dct_status else 3
    spec = build_spec(cfg.model, in_channels=in_ch, img_size=img,
                      num_classes=cfg.num_classes, bit_width=cfg.bit_width)
    codec_cfg = CodecConfig(cfg.channels, cfg.filter_size, cfg.image_size_dct,
                            cfg.dct_pattern) if cfg.dct_status else None

    pix = codec_cfg.pixel_size if codec_cfg else cfg.image_size
    trainset = pipeline.get_dataset(cfg.dataset, cfg.dataset_path, True,
                                    image_size=pix,
                                    num_classes=cfg.num_classes)
    testset = pipeline.get_dataset(cfg.dataset, cfg.dataset_path, False,
                                   image_size=pix,
                                   num_classes=cfg.num_classes)

    # seeded subset selection (reference homomorphic_eval.py:145-150)
    _, val_idx = pipeline.train_val_split(len(trainset), cfg.test_subset)
    _, test_idx = pipeline.train_val_split(
        len(testset), min(cfg.test_subset, len(testset) - 1))

    # model + checkpoint
    params, state = init_model(jax.random.key(0), spec)
    if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
        from .train import load_ckpt
        ck = load_ckpt(cfg.checkpoint_path)
        params, state = ck["state"]
        print(f"Loaded checkpoint {cfg.checkpoint_path} "
              f"({ck['prec1']:.3f}% Top-1 @ epoch {ck['epoch']})")
    else:
        print("WARNING: No checkpoint loaded. Using random weights "
              "(for testing only)")
        calib_imgs = trainset.gather(
            np.arange(min(cfg.calib_batch_size, len(trainset))))[0]
        params = calibrate_scales(params, state,
                                  _ingest(calib_imgs, codec_cfg), spec)
        _, _, state = forward(params, state,
                              _ingest(calib_imgs, codec_cfg), spec, train=True)

    # compile trunk -> FHE circuit (classifier stays clear); the first
    # calib batch drives accumulator-range calibration
    # (reference homomorphic_eval.py:258-261)
    # QAT vs PTQ from the model name, like the reference
    # (homomorphic_eval.py:95-98: 'qat' in name -> brevitas path, else
    # post-training quantization via compile_torch_model)
    quantization_type = "QAT" if spec.quantized else "PTQ"
    print(f"\nCompiling FHE Model ({quantization_type})...")
    calib_imgs = trainset.gather(
        np.arange(min(cfg.calib_batch_size, len(trainset))))[0]
    calib_x = np.asarray(_ingest(calib_imgs, codec_cfg))
    t = time.time()
    if quantization_type == "QAT":
        module = compile_qat_model(
            params, state, spec, n_bits=cfg.n_bits,
            rounding_threshold_bits={
                "n_bits": cfg.rounding_threshold_bits,
                "method": getattr(cfg, "rounding_method", "exact")},
            calib_data=calib_x,
            pbs_batch=cfg.pbs_batch,
            drop_policy=getattr(cfg, "drop_policy", "none"),
            p_error=cfg.p_error,
            range_margin=getattr(cfg, "range_margin", 2.0))
    else:
        module = compile_ptq_model(
            params, state, spec, calib_x, n_bits=cfg.n_bits,
            rounding_threshold_bits=cfg.rounding_threshold_bits,
            pbs_batch=cfg.pbs_batch)
    print(f"Time for FHE compilation {time.time()-t:.2f}")

    bitwidth = module.maximum_integer_bit_width()
    print(f"Max bit-width: {bitwidth} bits" +
          (" -> it works in FHE!!" if bitwidth <= 16
           else " too high for FHE computation"))
    print(f"PBS per image: {module.circuit.num_pbs}")

    if cfg.fhe_mode == "execute":
        t = time.time()
        module.keygen()
        print(f"Keygen time: {time.time()-t:.2f}s")

    clf_w = np.asarray(params["classifier"]["w"])
    clf_b = np.asarray(params["classifier"]["b"])

    # clear sanity eval
    print(f"\nRunning UNENCRYPTED model on a subset of {cfg.test_subset} images...")
    v1, v5 = test_unencrypted(params, state, spec, codec_cfg, trainset,
                              val_idx, cfg.calib_batch_size)
    t1, t5 = test_unencrypted(params, state, spec, codec_cfg, testset,
                              test_idx, cfg.calib_batch_size)
    print(f"[Validation] Top-1 Acc: {v1.avg:.3f}% | Top-5 Acc: {v5.avg:.3f}%")
    print(f"[Test] Top-1 Acc: {t1.avg:.3f}% | Top-5 Acc: {t5.avg:.3f}%")

    # encrypted (or simulated) eval
    if cfg.fhe_mode == "simulate":
        t = time.time()
        print(f"\nRunning ENCRYPTED validation inference in SIMULATE mode...")
        e1, e5 = test_encrypted(module, clf_w, clf_b, codec_cfg, trainset,
                                val_idx, cfg.calib_batch_size, "simulate")
        dt = (time.time() - t) / max(len(val_idx), 1)
        print(f"[Validation] Top-1 Acc: {e1.avg:.3f}% | Top-5 Acc: "
              f"{e5.avg:.3f}% | Time per inference: {dt:.3f}")

    t = time.time()
    print(f"\nRunning ENCRYPTED test inference in {cfg.fhe_mode.upper()} mode "
          f"on a subset of {len(test_idx)} images...")
    e1, e5 = test_encrypted(module, clf_w, clf_b, codec_cfg, testset,
                            test_idx, cfg.test_batch_size, cfg.fhe_mode,
                            cfg.drop_limbs)
    dt = (time.time() - t) / max(len(test_idx), 1)
    print(f"[Test] Top-1 Acc: {e1.avg:.3f}% | Top-5 Acc: {e5.avg:.3f}% | "
          f"Time per inference in FHE: {dt:.2f}")
    if cfg.fhe_mode == "execute" and module.stats.get("pbs_per_sec"):
        s = module.stats
        print(f"[Stats] levelled {s['levelled_time']:.1f}s | PBS "
              f"{s['pbs_time']:.1f}s ({s['pbs_per_sec']:.1f} PBS/s, "
              f"{s.get('aux_pbs_executed', 0)} extraction bootstraps) | "
              f"keygen {s.get('keygen_time', 0):.1f}s")

    # reliability sweep (reference homomorphic_eval.py:366-440)
    if cfg.reliability_test and cfg.fhe_mode == "simulate":
        print("\n============ Encrypted Reliability Analysis ============")
        top1_plain, top5_plain, top1_enc, top5_enc = [], [], [], []
        for rstate in range(27, 29):
            _, sub_idx = pipeline.train_val_split(
                len(testset), min(cfg.test_subset, len(testset) - 1),
                random_state=rstate)
            p1, p5 = test_unencrypted(params, state, spec, codec_cfg,
                                      testset, sub_idx, cfg.calib_batch_size)
            e1, e5 = test_encrypted(module, clf_w, clf_b, codec_cfg, testset,
                                    sub_idx, cfg.calib_batch_size, "simulate")
            top1_plain.append(round(p1.avg, 3))
            top5_plain.append(round(p5.avg, 3))
            top1_enc.append(round(e1.avg, 3))
            top5_enc.append(round(e5.avg, 3))
        print(f"Unencrypted top1 acc: {top1_plain}")
        print(f"Unencrypted top5 acc: {top5_plain}")
        print(f"Encrypted top1 acc: {top1_enc}")
        print(f"Encrypted top5 acc: {top5_enc}")
    print("Done")


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("Interrupted")
        sys.exit(130)
