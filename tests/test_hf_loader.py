"""HF checkpoint loading parity: tiny HF models (saved locally) vs our
functional forwards at full precision.

The reference loads HF checkpoints directly (``model/main.py:17-51``); here
tiny randomly-initialized HF models are saved to disk and reloaded through
``models.hf_loader``, asserting logits match the HF (torch CPU) forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atom_tpu.config import FP16_BASELINE
from atom_tpu.models.hf_loader import (
    config_from_hf,
    load_llama_params,
    load_mixtral_params,
    load_opt_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _logits_close(ours, theirs, rtol=2e-2, atol=2e-2):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), theirs, rtol=rtol, atol=atol
    )


def test_llama_hf_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    path = str(tmp_path / "llama")
    model.save_pretrained(path)

    cfg = config_from_hf(path)
    assert cfg.hidden_size == 64 and cfg.num_layers == 2
    params = load_llama_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[1, 5, 9, 2, 77, 3]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    from atom_tpu.models import llama

    got = llama.forward(params, jnp.asarray(ids), cfg, FP16_BASELINE)
    _logits_close(got, want)


def test_opt_hf_parity(tmp_path):
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=112, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=64,
    )
    torch.manual_seed(1)
    model = OPTForCausalLM(hf_cfg).eval()
    path = str(tmp_path / "opt")
    model.save_pretrained(path)

    cfg = config_from_hf(path)
    params = load_opt_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[2, 5, 9, 13, 77]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    from atom_tpu.models import opt

    got = opt.forward(params, jnp.asarray(ids), cfg, FP16_BASELINE)
    _logits_close(got, want)


def test_mixtral_hf_parity(tmp_path):
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
    )
    torch.manual_seed(2)
    model = MixtralForCausalLM(hf_cfg).eval()
    path = str(tmp_path / "mixtral")
    model.save_pretrained(path)

    cfg = config_from_hf(path)
    assert cfg.num_experts == 4
    params = load_mixtral_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[1, 5, 9, 2]], np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    from atom_tpu.models import mixtral

    got = mixtral.forward(params, jnp.asarray(ids), cfg, FP16_BASELINE)
    _logits_close(got, want)
