"""The reference's shipped pretrained assets must load and be usable
(round-2 verdict #6): bow_voc.yml.gz into the tensor vocabulary,
ba_model.pt into BAParams (tests/test_training.py), disc_model.pt into
DiscNet params with output parity against the torch reference module.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

VOC = "/root/reference/pretrained/bow_voc.yml.gz"
DISC = "/root/reference/pretrained/disc_model.pt"
REF_DISC_PY = "/root/reference/representation/models/discriminator.py"


@pytest.mark.skipif(not os.path.exists(VOC), reason="asset not present")
def test_load_real_dbow2_vocabulary():
    from sage_slam_tpu.loop import vocabulary

    voc = vocabulary.load_dbow2_yaml(VOC)
    # bow_voc.flags: k=10, L=3; the shipped file holds 2110 nodes of
    # which 1000 are words
    assert voc.levels == 3
    assert voc.children.shape[1] == 10
    # complete 10-ary tree of depth 3: 10 + 100 + 1000 nodes + root
    assert voc.descriptors.shape[0] == 1111
    assert voc.descriptors.shape[1] == 16  # FS=16 descriptors
    assert voc.num_words == 1000
    assert int((voc.word_ids >= 0).sum()) == 1000
    # word weights positive somewhere, inner nodes zeroed
    w = np.array(voc.weights)
    wid = np.array(voc.word_ids)
    assert (w[wid < 0] == 0).all()
    assert np.isfinite(w).all()

    # transform: self-similarity is maximal
    rng = np.random.default_rng(0)
    feats = np.tanh(rng.standard_normal((300, 16)).astype(np.float32))
    v = vocabulary.transform(voc, jnp.asarray(feats))
    assert np.isfinite(np.array(v)).all()
    assert float(jnp.sum(jnp.abs(v))) > 0
    other = np.tanh(rng.standard_normal((300, 16)).astype(np.float32))
    v2 = vocabulary.transform(voc, jnp.asarray(other))
    s_self = float(vocabulary.score_l1(v, v))
    s_cross = float(vocabulary.score_l1(v, v2))
    assert s_self >= s_cross
    assert s_self == pytest.approx(1.0, abs=1e-4)


@pytest.mark.skipif(
    not (os.path.exists(DISC) and os.path.exists(REF_DISC_PY)),
    reason="asset not present",
)
def test_disc_model_import_parity():
    """disc_model.pt -> our DiscNet params; output matches the torch
    reference module to float tolerance."""
    import torch

    from sage_slam_tpu.models import partial_unet as pu
    from sage_slam_tpu.training import discriminator

    sd = torch.load(DISC, map_location="cpu", weights_only=False)["model"]

    cfg = discriminator.DiscConfig(
        in_channels=4, filter_base=12, num_blocks=4, group_size=4,
        img_height=64, img_width=80,
    )
    import jax

    params = discriminator.init_params(jax.random.key(0), cfg)
    # name map: torch 'adv_layer' -> ours 'adv'; Linear weight [1, HW]
    # transposes to our [HW, 1]
    np_sd = {k: v.numpy() for k, v in sd.items()}
    np_sd["adv.weight"] = np_sd.pop("adv_layer.weight").T
    np_sd["adv.bias"] = np_sd.pop("adv_layer.bias")
    params = pu.load_torch_state_dict(params, np_sd)
    # spot-check a copied tensor
    np.testing.assert_allclose(
        np.array(params["blocks"][0]["conv1"]["weight"]),
        np_sd["blocks.0.conv1.weight"],
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64, 80)).astype(np.float32)
    ours = float(discriminator.apply(params, jnp.asarray(x), cfg))

    spec = importlib.util.spec_from_file_location("ref_disc", REF_DISC_PY)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    net = ref_mod.DiscNet(
        img_height=64, img_width=80, input_nc=4, filter_base=12,
        num_block=4, group_size=4,
    )
    net.load_state_dict(sd)
    net.eval()
    with torch.no_grad():
        theirs = float(net(torch.from_numpy(x)[None]))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_load_torch_state_dict_roundtrip():
    """load_torch_state_dict maps a real torch module's state_dict into a
    params pytree with matching nesting."""
    import torch

    from sage_slam_tpu.models import partial_unet as pu

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    sd = {f"conv1.{k}": v.numpy() for k, v in conv.state_dict().items()}
    params = {
        "conv1": {
            "weight": jnp.zeros((5, 3, 3, 3)),
            "bias": jnp.zeros((5,)),
        }
    }
    out = pu.load_torch_state_dict(params, sd)
    np.testing.assert_allclose(
        np.array(out["conv1"]["weight"]), sd["conv1.weight"]
    )
    np.testing.assert_allclose(
        np.array(out["conv1"]["bias"]), sd["conv1.bias"]
    )
