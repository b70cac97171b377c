"""BERT encoder parity against HF torch (random tiny weights)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hsenet_tpu.configs import BertConfig
from hsenet_tpu.models.bert import BertEncoder, convert_hf_bert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = BertConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def test_bert_matches_hf(hf_bert, rng):
    input_ids = rng.integers(0, TINY.vocab_size, size=(2, 16))
    attention_mask = np.ones((2, 16), np.int32)
    attention_mask[1, 10:] = 0  # right padding

    with torch.no_grad():
        ref = hf_bert(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).last_hidden_state.numpy()

    params = convert_hf_bert(hf_bert.state_dict(), TINY)
    model = BertEncoder(TINY)
    out = model.apply(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))

    # padded positions differ (HF computes them attending over valid tokens
    # too); compare valid positions only
    np.testing.assert_allclose(
        np.asarray(out)[0], ref[0], atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out)[1, :10], ref[1, :10], atol=1e-4, rtol=1e-4
    )


def test_bert_shapes(key):
    model = BertEncoder(TINY)
    ids = jnp.ones((3, 12), jnp.int32)
    params = model.init(key, ids)
    out = model.apply(params, ids)
    assert out.shape == (3, 12, TINY.hidden_size)
