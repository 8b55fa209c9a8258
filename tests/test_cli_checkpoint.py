"""CLI pipeline (tiny model, synthetic data) + checkpoint round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_cli_pipeline_tiny(tmp_path, capsys):
    from atom_tpu.main import main

    save = str(tmp_path / "ckpt")
    main([
        "tiny-llama", "synthetic",
        "--wbits", "4", "--abits", "4", "--reorder", "--keeper", "32",
        "--weight_group_size", "32", "--act_group_size", "32",
        "--weight_channel_group", "1",
        "--calib_samples", "2", "--seqlen", "64",
        "--eval_ppl", "--save_dir", save,
    ])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("targetResult,")]
    assert len(lines) == 1
    _, ds, ppl = lines[0].split(",")
    assert ds == "synthetic" and float(ppl) > 1.0
    assert os.path.exists(os.path.join(save, "params.npz"))
    assert os.path.exists(os.path.join(save, "meta.json"))


def test_checkpoint_roundtrip(tmp_path):
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models import TINY_LLAMA, llama
    from atom_tpu.utils.checkpoint import (
        load_meta,
        load_quantized,
        save_quantized,
    )

    spec = ATOM_W4A4.replace(weight_group_size=64, act_group_size=64, keeper=64)
    params = llama.init_params(jax.random.PRNGKey(0), TINY_LLAMA, jnp.bfloat16)
    idx = {"layer0": jnp.arange(TINY_LLAMA.hidden_size, dtype=jnp.int32)}
    d = str(tmp_path / "q")
    save_quantized(d, params, idx, TINY_LLAMA, spec)

    cfg2, spec2 = load_meta(d)
    assert cfg2 == TINY_LLAMA and spec2 == spec

    like = llama.init_params(jax.random.PRNGKey(1), TINY_LLAMA, jnp.bfloat16)
    params2, idx2 = load_quantized(d, like, idx)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(idx["layer0"]), np.asarray(idx2["layer0"]))


def test_restore_dtype_drift_is_safe(tmp_path):
    """A leaf saved as bf16 restored into an f32-dtyped target must decode
    through the RECORDED dtype, not reinterpret raw uint16 bits (advisor
    round-1 low)."""
    import jax.numpy as jnp
    import numpy as np

    from atom_tpu.utils.checkpoint import restore_pytree, save_pytree

    tree = {"w": jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16)}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    like_f32 = {"w": jnp.zeros((3,), jnp.float32)}
    out = restore_pytree(path, like_f32)
    np.testing.assert_allclose(
        np.asarray(out["w"]), [1.5, -2.25, 3.0], rtol=1e-2
    )
    assert out["w"].dtype == jnp.float32


def test_restore_shape_mismatch_is_loud(tmp_path):
    """Restoring a stack into a differently-shaped template must raise:
    scan-based forwards iterate whatever leading (layer) axis was restored,
    so a silent mismatch runs a different model than the config says
    (found via a full-depth byte-LM checkpoint behind a --layers-truncated
    cfg: the scan ran all 12 saved layers while serving ran 2)."""
    import jax.numpy as jnp
    import pytest

    from atom_tpu.utils.checkpoint import restore_pytree, save_pytree

    tree = {"layers": {"w": jnp.ones((12, 8), jnp.float32)}}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    like_trunc = {"layers": {"w": jnp.zeros((2, 8), jnp.float32)}}
    with pytest.raises(AssertionError, match="shape"):
        restore_pytree(path, like_trunc)
