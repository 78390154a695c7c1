"""CenterSnap 6D-pose training CLI (fork-workload parity).

Equivalent of reference train.py:152-356 (WDS shards -> WorldMirrorCenterSnap
-> 100*MSE(heatmap) + masked-L1(pose map), AdamW + cosine, periodic eval +
checkpoints) with the additions the reference lacks: resume (--resume) and a
typed config surface.

  python tools/train.py --train-shards 'data/train-{000000..000009}.tar' \
      --test-shards 'data/test-*.tar' --epochs 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-shards", required=True)
    p.add_argument("--test-shards", default="")
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--img-size", type=int, default=384)
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--depth-cond", action="store_true",
                   help="condition on the depth channel (reference train.py:167)")
    p.add_argument("--arch", choices=("transformer", "res_fpn"),
                   default="transformer",
                   help="res_fpn = ResNet-FPN panoptic baseline "
                        "(reference train_centersnap_panoptic.py; its HParams "
                        "default lr 6e-4 / wd 1e-4 / batch 32)")
    p.add_argument("--ckpt", default="checkpoints/centersnap.npz")
    p.add_argument("--ckpt-every-epochs", type=int, default=2)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from hunyuanworld_mirror_tpu.models import centersnap, panoptic
    from hunyuanworld_mirror_tpu.training import trainer

    if args.arch == "res_fpn":
        model_cfg = panoptic.PanopticConfig()
    else:
        model_cfg = centersnap.CenterSnapConfig(
            img_size=args.img_size, patch_size=args.patch_size,
            use_depth_condition=args.depth_cond)
    cfg = trainer.TrainConfig(
        train_shards=args.train_shards, test_shards=args.test_shards,
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        weight_decay=args.weight_decay, ckpt_path=args.ckpt,
        ckpt_every_epochs=args.ckpt_every_epochs, resume=args.resume,
        seed=args.seed, arch=args.arch, model=model_cfg)
    trainer.train(cfg)


if __name__ == "__main__":
    main()
