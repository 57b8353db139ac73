import numpy as np
import jax
import jax.numpy as jnp


def make_batch(B=1, H=64, W=64, G=8, seed=0):
    r = np.random.RandomState(seed)
    xy = r.rand(B, G, 2).astype(np.float32) * 30
    wh = r.rand(B, G, 2).astype(np.float32) * 20 + 4
    return {
        "image": jnp.asarray(r.randint(0, 255, (B, H, W, 3)), jnp.uint8),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], axis=2)),
        "gt_classes": jnp.asarray(r.randint(0, 80, (B, G)), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
        "scale": jnp.ones((B,), jnp.float32),
        "orig_size": jnp.array([[H, W]] * B, jnp.float32),
    }


def test_fcos_loss_finite_and_grads(tiny_fcos):
    det, variables = tiny_fcos
    batch = make_batch()

    def loss_fn(params):
        total, metrics = det.loss({**variables, "params": params}, batch)
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) > 0
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fcos_predict_shapes(tiny_fcos):
    det, variables = tiny_fcos
    batch = make_batch()
    dets = jax.jit(det.predict)(variables, batch)
    D = det.max_dets
    assert dets["boxes"].shape == (1, D, 4)
    assert dets["scores"].shape == (1, D)
    assert dets["classes"].shape == (1, D)
    assert dets["valid"].shape == (1, D)
    # untrained model with focal-prior bias -> scores < threshold -> no dets
    assert np.isfinite(np.asarray(dets["boxes"])).all()


def test_fcos_empty_gt_loss(tiny_fcos):
    det, variables = tiny_fcos
    batch = make_batch()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, metrics = jax.jit(det.loss)(variables, batch)
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) == 0 or float(metrics["num_pos"]) == 1.0
