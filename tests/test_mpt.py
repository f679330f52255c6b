"""MPT decoder parity vs HF MptForCausalLM."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialrgpt_tpu.models.mpt import MPTConfig, alibi_slopes, convert_mpt, forward_logits


def test_alibi_slopes_power_of_two():
    s = alibi_slopes(4)
    assert len(s) == 4 and s[0] > s[1] > s[2] > s[3]


def test_mpt_parity():
    import torch
    from transformers import MptConfig as HFCfg
    from transformers import MptForCausalLM

    cfg = MPTConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=128, max_seq_len=128)
    torch.manual_seed(0)
    hf = MptForCausalLM(
        HFCfg(
            d_model=64,
            n_heads=4,
            n_layers=2,
            vocab_size=128,
            max_seq_len=128,
            expansion_ratio=4,
            attn_implementation="eager",
        )
    ).eval()
    params = convert_mpt(hf.state_dict(), cfg)
    ids = np.random.default_rng(0).integers(0, 128, (2, 13))
    with torch.no_grad():
        expected = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(forward_logits(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=2e-3)


@pytest.mark.slow
def test_mpt_composite_vlm_forward():
    import jax
    import numpy as np

    import __graft_entry__ as graft
    from spatialrgpt_tpu.models import mpt as mpt_lib
    from spatialrgpt_tpu.models import vlm

    cfg = graft._tiny_cfg()
    mcfg = MPTConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=128, max_seq_len=512)
    params = vlm.init_params(jax.random.PRNGKey(0), cfg)
    params["llm"] = mpt_lib.init_params(jax.random.PRNGKey(1), mcfg)
    batch = graft._tiny_batch(cfg, B=2, S=64)
    logits = vlm.forward_mpt(params, cfg, mcfg, batch)
    assert logits.shape == (2, 64, 128)
    assert np.isfinite(np.asarray(logits)).all()
