"""PVT torch-checkpoint import (checkpoint/checkpointer.py
import_pvt_weights): name/layout mapping oracle-tested against a torch
forward of the same architecture. The reference loads PVT zoo .pth files
over HTTP into its detection backbone
(`slender_det/modeling/backbone/pvt.py:273-275`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slenderobjdet_tpu.checkpoint.checkpointer import (  # noqa: E402
    import_pvt_weights,
    load_model_weights,
)
from slenderobjdet_tpu.models.backbones.pvt import PVT  # noqa: E402

pytestmark = pytest.mark.slow

DIMS = (8, 16, 32, 64)
DEPTHS = (1, 1, 1, 1)
HEADS = (1, 2, 4, 8)
MLP = (2, 2, 2, 2)
SR = (8, 4, 2, 1)


def _fake_zoo_state_dict(seed=0):
    """Random weights in the PVT zoo's torch layout (pvt_tiny-style keys),
    incl. classification-only leaves that the import must skip."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    in_ch = 3
    for i, (c, d) in enumerate(zip(DIMS, DEPTHS), start=1):
        patch = 4 if i == 1 else 2
        sd[f"patch_embed{i}.proj.weight"] = r(c, in_ch, patch, patch)
        sd[f"patch_embed{i}.proj.bias"] = r(c)
        sd[f"patch_embed{i}.norm.weight"] = 1 + 0.1 * r(c)
        sd[f"patch_embed{i}.norm.bias"] = r(c)
        # zero pos embeds isolate the linear/conv mapping in the oracle;
        # resize semantics are covered separately below. stage 4 carries a
        # cls token slot like the zoo files.
        n = 49 + (1 if i == 4 else 0)
        sd[f"pos_embed{i}"] = torch.zeros(1, n, c)
        for j in range(d):
            p = f"block{i}.{j}"
            sd[f"{p}.norm1.weight"] = 1 + 0.1 * r(c)
            sd[f"{p}.norm1.bias"] = r(c)
            sd[f"{p}.attn.q.weight"] = r(c, c)
            sd[f"{p}.attn.q.bias"] = r(c)
            sd[f"{p}.attn.kv.weight"] = r(2 * c, c)
            sd[f"{p}.attn.kv.bias"] = r(2 * c)
            sd[f"{p}.attn.proj.weight"] = r(c, c)
            sd[f"{p}.attn.proj.bias"] = r(c)
            if SR[i - 1] > 1:
                sd[f"{p}.attn.sr.weight"] = r(c, c, SR[i - 1], SR[i - 1])
                sd[f"{p}.attn.sr.bias"] = r(c)
                sd[f"{p}.attn.norm.weight"] = 1 + 0.1 * r(c)
                sd[f"{p}.attn.norm.bias"] = r(c)
            sd[f"{p}.norm2.weight"] = 1 + 0.1 * r(c)
            sd[f"{p}.norm2.bias"] = r(c)
            sd[f"{p}.mlp.fc1.weight"] = r(c * MLP[i - 1], c)
            sd[f"{p}.mlp.fc1.bias"] = r(c * MLP[i - 1])
            sd[f"{p}.mlp.fc2.weight"] = r(c, c * MLP[i - 1])
            sd[f"{p}.mlp.fc2.bias"] = r(c)
        in_ch = c
    # classification-only leaves (must be skipped, not crash)
    sd["cls_token"] = r(1, 1, DIMS[-1])
    sd["norm.weight"] = r(DIMS[-1])
    sd["norm.bias"] = r(DIMS[-1])
    sd["head.weight"] = r(1000, DIMS[-1])
    sd["head.bias"] = r(1000)
    return sd


def _torch_forward(sd, x_nhwc):
    """Torch forward of OUR PVT semantics (flax pvt.py:99-142) from the zoo
    state dict: per-stage patch conv + LN + (zero) pos + block + output LN
    (weight 1 / bias 0 — the stage_norm params a v1 zoo file doesn't have).
    LN eps 1e-6 (PVT's norm_layer), gelu tanh-approximate (flax default)."""
    import torch.nn.functional as F

    def ln(t, w=None, b=None, c=None):
        c = c if c is not None else t.shape[-1]
        if w is None:
            w = torch.ones(c, dtype=t.dtype)
            b = torch.zeros(c, dtype=t.dtype)
        return F.layer_norm(t, (c,), w, b, eps=1e-6)

    x = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).float()
    B = x.shape[0]
    outs = {}
    for i, (c, d) in enumerate(zip(DIMS, DEPTHS), start=1):
        patch = 4 if i == 1 else 2
        x = F.conv2d(x, sd[f"patch_embed{i}.proj.weight"],
                     sd[f"patch_embed{i}.proj.bias"], stride=patch)
        H, W = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)  # B, N, C
        x = ln(x, sd[f"patch_embed{i}.norm.weight"],
               sd[f"patch_embed{i}.norm.bias"])
        # pos embed is zero by construction
        nh, sr = HEADS[i - 1], SR[i - 1]
        for j in range(d):
            p = f"block{i}.{j}"
            h = ln(x, sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
            q = F.linear(h, sd[f"{p}.attn.q.weight"], sd[f"{p}.attn.q.bias"])
            if sr > 1:
                xr = h.transpose(1, 2).reshape(B, c, H, W)
                xr = F.conv2d(xr, sd[f"{p}.attn.sr.weight"],
                              sd[f"{p}.attn.sr.bias"], stride=sr)
                xr = xr.flatten(2).transpose(1, 2)
                xr = ln(xr, sd[f"{p}.attn.norm.weight"],
                        sd[f"{p}.attn.norm.bias"])
            else:
                xr = h
            kv = F.linear(xr, sd[f"{p}.attn.kv.weight"],
                          sd[f"{p}.attn.kv.bias"])
            k, v = kv.chunk(2, dim=-1)

            def heads(t):
                return t.reshape(B, -1, nh, c // nh).permute(0, 2, 1, 3)

            qh, kh, vh = heads(q), heads(k), heads(v)
            attn = (qh @ kh.transpose(-2, -1)) * (c // nh) ** -0.5
            out = (attn.softmax(-1) @ vh).permute(0, 2, 1, 3).reshape(B, -1, c)
            x = x + F.linear(out, sd[f"{p}.attn.proj.weight"],
                             sd[f"{p}.attn.proj.bias"])
            h = ln(x, sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
            h = F.linear(h, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
            h = F.gelu(h, approximate="tanh")
            h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
            x = x + h
        x = ln(x, c=c)  # stage_norm at init
        outs[f"pvt{i}"] = x.reshape(B, H, W, c).detach().numpy()
        x = x.transpose(1, 2).reshape(B, c, H, W)
    return outs


def test_pvt_import_matches_torch_forward(tmp_path):
    model = PVT(depths=DEPTHS, dims=DIMS, num_heads=HEADS,
                mlp_ratios=MLP, sr_ratios=SR)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = _fake_zoo_state_dict()
    # exercise the .pth dispatch in load_model_weights
    ckpt = str(tmp_path / "pvt_fake.pth")
    torch.save(sd, ckpt)
    params, _ = load_model_weights(ckpt, variables["params"], {})

    # spot-check layouts: dense transposed, conv HWIO
    q = np.asarray(params["stage1_block0"]["attn"]["q"]["kernel"])
    np.testing.assert_allclose(q, sd["block1.0.attn.q.weight"].numpy().T)
    pk = np.asarray(params["patch_embed1"]["kernel"])
    np.testing.assert_allclose(
        pk, sd["patch_embed1.proj.weight"].numpy().transpose(2, 3, 1, 0))

    got = model.apply({"params": params}, jnp.asarray(x))
    want = _torch_forward(sd, x)
    for name in ("pvt1", "pvt2", "pvt3", "pvt4"):
        np.testing.assert_allclose(np.asarray(got[name]), want[name],
                                   atol=2e-4, rtol=2e-4)


def test_pvt_pos_embed_resample_and_cls_drop():
    model = PVT(depths=DEPTHS, dims=DIMS, num_heads=HEADS,
                mlp_ratios=MLP, sr_ratios=SR)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = {k: v for k, v in _fake_zoo_state_dict().items()}
    # constant grids resample to the same constant; stage 4 cls slot gets a
    # poison value that must be dropped
    sd["pos_embed1"] = torch.full((1, 49, DIMS[0]), 3.5)
    poisoned = torch.full((1, 50, DIMS[3]), 2.25)
    poisoned[:, 0] = 1e9
    sd["pos_embed4"] = poisoned
    params = import_pvt_weights(
        {k: v.numpy() for k, v in sd.items()}, variables["params"])
    np.testing.assert_allclose(np.asarray(params["pos_embed1"]), 3.5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["pos_embed4"]), 2.25,
                               atol=1e-5)


def test_pvt_import_rejects_non_pvt(tmp_path):
    ckpt = str(tmp_path / "other.pth")
    torch.save({"some.layer.weight": torch.zeros(3)}, ckpt)
    with pytest.raises(ValueError, match="PVT"):
        load_model_weights(ckpt, {"x": np.zeros(3)}, {})


def test_pvtv2_dwconv_and_stage_norm_import():
    """v2-only leaves: mlp.dwconv (torch groups=C) regrouped to the flax
    feature_group_count layout — verified numerically — and the top-level
    per-stage norm{i} landing in stage_norm{i}."""
    import torch.nn.functional as F

    from slenderobjdet_tpu.models.backbones.pvt import PVTv2

    model = PVTv2(depths=DEPTHS, dims=DIMS, num_heads=HEADS,
                  mlp_ratios=MLP, sr_ratios=SR)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = variables["params"]
    c = DIMS[0] * MLP[0]
    g = torch.Generator().manual_seed(1)
    w = torch.randn(c, 1, 3, 3, generator=g)
    b = torch.randn(c, generator=g)
    norm_w = torch.randn(DIMS[2], generator=g)
    sd = {"block1.0.mlp.dwconv.dwconv.weight": w.numpy(),
          "block1.0.mlp.dwconv.dwconv.bias": b.numpy(),
          "norm3.weight": norm_w.numpy(),
          "norm3.bias": np.zeros(DIMS[2], np.float32)}
    out = import_pvt_weights(sd, params)
    np.testing.assert_allclose(np.asarray(out["stage_norm3"]["scale"]),
                               norm_w.numpy())

    # numeric: torch grouped conv == flax feature_group_count conv with the
    # imported kernel
    x = torch.randn(1, c, 8, 8, generator=g)
    want = F.conv2d(x, w, b, padding=1, groups=c)
    import flax.linen as nn

    conv = nn.Conv(c, (3, 3), padding=1, feature_group_count=c)
    got = conv.apply(
        {"params": {"kernel": jnp.asarray(
            np.asarray(out["stage1_block0"]["dwconv"]["kernel"])),
            "bias": jnp.asarray(b.numpy())}},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).detach().numpy(),
        atol=1e-5)
