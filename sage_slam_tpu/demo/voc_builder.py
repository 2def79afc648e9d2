"""Offline BoW vocabulary training CLI — tools/voc_builder.cpp equivalent.

Collects feature-net descriptors at random valid pixels over a dataset
(500/frame, k=10, L=3 per configs/bow_voc.flags) and trains the
hierarchical k-means vocabulary; saves as npz.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    # crash diagnostics (demo/main.cpp:34-124 analog)
    import faulthandler

    faulthandler.enable()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_url", default="synthetic://")
    p.add_argument("--output", default="/tmp/bow_voc.npz")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--points_per_frame", type=int, default=500)
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--feat_checkpoint", default=None)
    p.add_argument("--input_size", default="128,160",
                   help="synthetic source image size H,W (must divide 32)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..io import dataset
    from ..loop import vocabulary
    from ..models import feature_network

    if args.source_url.startswith("synthetic://"):
        h, w = (int(x) for x in args.input_size.split(","))
        data = dataset.SyntheticInterface(
            num_frames=args.max_frames, height=h, width=w
        )
    else:
        data = dataset.from_url(args.source_url)
    feat_cfg = feature_network.FeatureNetConfig()
    params = feature_network.init_params(jax.random.key(0), feat_cfg)
    if args.feat_checkpoint:
        from ..models.partial_unet import load_torch_state_dict

        params = load_torch_state_dict(
            params, dict(np.load(args.feat_checkpoint))
        )

    apply_fn = jax.jit(
        lambda img: feature_network.apply(
            params, img, jnp.ones((1,) + img.shape[1:]), feat_cfg
        )[1]
    )
    rng = np.random.default_rng(0)
    descs = []
    doc_ids = []
    for i, rec in enumerate(data.frames()):
        if i >= args.max_frames:
            break
        fdesc = np.array(apply_fn(jnp.asarray(rec.image)))
        c, h, w = fdesc.shape
        idx = rng.choice(h * w, args.points_per_frame, replace=False)
        descs.append(fdesc.reshape(c, -1).T[idx])
        doc_ids.append(np.full(len(idx), i, np.int64))
    train = np.concatenate(descs)
    print(f"training vocabulary on {len(train)} descriptors")
    # per-frame doc ids enable DBoW2's TF-IDF word weighting
    voc = vocabulary.build_vocabulary(
        train, k=args.k, levels=args.levels,
        doc_ids=np.concatenate(doc_ids),
    )
    np.savez(
        args.output,
        children=np.array(voc.children),
        descriptors=np.array(voc.descriptors),
        weights=np.array(voc.weights),
        word_ids=np.array(voc.word_ids),
        num_words=voc.num_words,
        levels=voc.levels,
    )
    print(f"saved {voc.num_words}-word vocabulary to {args.output}")


def load_npz_vocabulary(path: str):
    import jax.numpy as jnp

    from ..loop.vocabulary import Vocabulary

    d = np.load(path)
    return Vocabulary(
        children=jnp.asarray(d["children"]),
        descriptors=jnp.asarray(d["descriptors"]),
        weights=jnp.asarray(d["weights"]),
        word_ids=jnp.asarray(d["word_ids"]),
        num_words=int(d["num_words"]),
        levels=int(d["levels"]),
    )


if __name__ == "__main__":
    main()
