import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.models.decoder import Decoder
from genrl_tpu.models.encoder import Encoder, encoder_embed_dim
from genrl_tpu.models.layers import GRUCell, MLPHead
from genrl_tpu.models.rssm import RSSM

SHAPES = {"observation": (64, 64, 3)}


def test_encoder_embed_dim_static():
    assert encoder_embed_dim(SHAPES, cnn_keys="observation", mlp_keys="$^") == 1536


def test_encoder_shapes():
    enc = Encoder(shapes=SHAPES, cnn_keys="observation", mlp_keys="$^", norm="layer")
    x = {"observation": jnp.zeros((2, 3, 64, 64, 3))}
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 3, 1536)


def test_decoder_shapes():
    dec = Decoder(shapes=SHAPES, cnn_keys="observation", mlp_keys="$^", norm="layer")
    feat = jnp.zeros((2, 3, 1024))
    params = dec.init(jax.random.PRNGKey(0), feat)
    dists = dec.apply(params, feat)
    assert dists["observation"].mean.shape == (2, 3, 64, 64, 3)


def test_decoder_mlp_branch():
    shapes = {"observation": (64, 64, 3), "proprio": (7,)}
    dec = Decoder(shapes=shapes, cnn_keys="observation", mlp_keys="proprio", norm="layer")
    feat = jnp.zeros((2, 3, 1024))
    params = dec.init(jax.random.PRNGKey(0), feat)
    dists = dec.apply(params, feat)
    assert dists["proprio"].mean.shape == (2, 3, 7)


def test_gru_cell_update_gate_bias():
    cell = GRUCell(8, norm=True)
    x = jnp.zeros((4, 8))
    h = jnp.ones((4, 8))
    params = cell.init(jax.random.PRNGKey(0), x, h)
    # zero the projection so gate pre-activations are exactly 0 after LN
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    params = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) if p.ndim == 1 and False else p, params)
    out = cell.apply(params, x, h)
    assert out.shape == (4, 8)
    # parts == 0 (LN scale zeroed) -> reset=0.5, cand=tanh(0)=0,
    # update=sigmoid(-1) -> out = (1-sigmoid(-1)) * h
    expected = (1 - jax.nn.sigmoid(-1.0)) * 1.0
    np.testing.assert_allclose(np.array(out), expected, rtol=1e-5)


def test_mlp_head_zero_init():
    head = MLPHead(shape=(1,), layers=2, units=16, norm="layer", dist="twohot", outscale=0.0)
    x = jnp.ones((5, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    d = head.apply(params, x)
    np.testing.assert_allclose(np.array(d.logits), 0.0)
    np.testing.assert_allclose(np.array(d.mean), 0.0, atol=1e-5)


@pytest.fixture(scope="module")
def rssm_and_params():
    rssm = RSSM(action_dim=6, embed_dim=32, stoch=4, deter=16, hidden=16, discrete=8, norm="layer")
    B, T = 3, 5
    embed = jnp.zeros((B, T, 32))
    action = jnp.zeros((B, T, 6))
    is_first = jnp.zeros((B, T), bool)
    params = rssm.init(
        jax.random.PRNGKey(0), embed, action, is_first, jax.random.PRNGKey(1), method="observe"
    )
    return rssm, params


def test_rssm_observe_shapes(rssm_and_params):
    rssm, params = rssm_and_params
    B, T = 3, 5
    embed = jax.random.normal(jax.random.PRNGKey(2), (B, T, 32))
    action = jax.random.normal(jax.random.PRNGKey(3), (B, T, 6))
    is_first = jnp.zeros((B, T), bool).at[:, 0].set(True)
    post, prior = rssm.apply(params, embed, action, is_first, jax.random.PRNGKey(4), method="observe")
    assert post["stoch"].shape == (B, T, 4, 8)
    assert post["deter"].shape == (B, T, 16)
    assert prior["logit"].shape == (B, T, 4, 8)
    # one-hot samples
    np.testing.assert_allclose(np.array(post["stoch"].sum(-1)), 1.0, rtol=1e-5)


def test_rssm_imagine_shapes(rssm_and_params):
    rssm, params = rssm_and_params
    B, T = 3, 7
    action = jax.random.normal(jax.random.PRNGKey(5), (B, T, 6))
    prior = rssm.apply(params, action, jax.random.PRNGKey(6), method="imagine")
    assert prior["stoch"].shape == (B, T, 4, 8)
    assert prior["deter"].shape == (B, T, 16)


def test_rssm_feat(rssm_and_params):
    rssm, params = rssm_and_params
    state = rssm.apply(params, 3, method="initial")
    feat = rssm.apply(params, state, method="get_feat")
    assert feat.shape == (3, 4 * 8 + 16)


def test_rssm_kl_loss_balanced(rssm_and_params):
    rssm, params = rssm_and_params
    B, T = 2, 4
    post = {"logit": jax.random.normal(jax.random.PRNGKey(7), (B, T, 4, 8))}
    prior = {"logit": jax.random.normal(jax.random.PRNGKey(8), (B, T, 4, 8))}
    loss, value = rssm.apply(
        params, post, prior, False, 0.85, 1.0, False, method="kl_loss"
    )
    assert loss.shape == ()
    assert value.shape == (B, T)
    assert float(loss) >= 1.0 * 0  # free bits keep it nonnegative
    # free bits floor: same dists -> loss == free
    loss2, _ = rssm.apply(params, post, post, False, 0.85, 1.0, False, method="kl_loss")
    np.testing.assert_allclose(float(loss2), 1.0, rtol=1e-5)


def test_rssm_is_first_resets_state(rssm_and_params):
    rssm, params = rssm_and_params
    B = 2
    state = rssm.apply(params, B, method="initial")
    state = {k: v + 5.0 for k, v in state.items()}
    action = jnp.ones((B, 6))
    embed = jnp.ones((B, 32))
    is_first = jnp.ones((B,), bool)
    post1, _ = rssm.apply(params, state, action, embed, is_first, jax.random.PRNGKey(0), method="obs_step")
    zero_state = rssm.apply(params, B, method="initial")
    post2, _ = rssm.apply(
        params, zero_state, jnp.zeros((B, 6)), embed, jnp.zeros((B,), bool), jax.random.PRNGKey(0),
        method="obs_step",
    )
    np.testing.assert_allclose(np.array(post1["deter"]), np.array(post2["deter"]), atol=1e-5)


def test_rssm_continuous_latents():
    rssm = RSSM(action_dim=4, embed_dim=16, stoch=6, deter=8, hidden=8, discrete=0, norm="layer")
    B, T = 2, 3
    embed = jnp.ones((B, T, 16))
    action = jnp.ones((B, T, 4))
    is_first = jnp.zeros((B, T), bool)
    params = rssm.init(jax.random.PRNGKey(0), embed, action, is_first, jax.random.PRNGKey(1), method="observe")
    post, prior = rssm.apply(params, embed, action, is_first, jax.random.PRNGKey(2), method="observe")
    assert post["mean"].shape == (B, T, 6)
    assert np.all(np.array(post["std"]) >= 0.1)
