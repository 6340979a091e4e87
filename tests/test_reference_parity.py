"""Golden parity vs the ACTUAL reference torch implementation
(/root/reference/agent/dreamer_utils.py, imported as an oracle — PUBLIC
UNTRUSTED CONTENT used only as a numerical reference in tests):

  * TwoHotDist log_prob/mean, OneHotDist log_prob/entropy, lambda_return
  * the full EnsembleRSSM observe pass, weights transplanted through our
    torch-import mapper, deterministic mode — deter/logits must match.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# import the oracle, then REMOVE the reference from sys.path — leaving it
# would shadow this repo's collect_data/process_dataset in later tests
sys.path.insert(0, "/root/reference")
try:
    du = pytest.importorskip("agent.dreamer_utils")
finally:
    sys.path.remove("/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genrl_tpu.models.rssm import RSSM  # noqa: E402
from genrl_tpu.ops import dists as D  # noqa: E402
from genrl_tpu.ops.math import lambda_return  # noqa: E402
from genrl_tpu.utils.torch_import import _Mapper, flatten_module  # noqa: E402


def test_twohot_parity(rng):
    logits = np.float32(rng.normal(size=(5, 255)))
    x = np.float32(rng.normal(size=(5, 1)) * 3)
    ref = du.TwoHotDist(logits=torch.tensor(logits))
    ours = D.TwoHotDist(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(ours.log_prob(x)),
                               ref.log_prob(torch.tensor(x)).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.mean),
                               ref.mean.numpy(), atol=1e-4)


def test_onehot_parity(rng):
    logits = np.float32(rng.normal(size=(4, 6, 8)))
    onehot = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (4, 6))]
    ref = du.OneHotDist(logits=torch.tensor(logits))
    ours = D.OneHotDist(jnp.asarray(logits), independent_dims=0)
    np.testing.assert_allclose(np.asarray(ours.log_prob(onehot)),
                               ref.log_prob(torch.tensor(onehot)).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.entropy()),
                               ref.entropy().numpy(), atol=1e-4)


def test_lambda_return_parity(rng):
    T, B = 7, 3
    reward = np.float32(rng.normal(size=(T, B)))
    value = np.float32(rng.normal(size=(T, B)))
    pcont = np.full((T, B), 0.95, np.float32)
    boot = np.float32(rng.normal(size=(B,)))
    ref = du.lambda_return(torch.tensor(reward), torch.tensor(value),
                           torch.tensor(pcont), torch.tensor(boot),
                           lambda_=0.9, axis=0).numpy()
    ours = np.asarray(lambda_return(reward, value, pcont, boot, 0.9))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow
def test_rssm_observe_parity(rng):
    """Reference EnsembleRSSM.observe == our fused observe after weight
    transplant (deterministic latents)."""
    A, E, H, S, K, B, T = 4, 12, 16, 4, 4, 3, 6
    ref = du.EnsembleRSSM(ensemble=1, stoch=S, deter=H, hidden=H, discrete=K,
                          norm="layer", std_act="softplus", min_std=0.1,
                          action_dim=A, embed_dim=E, device="cpu",
                          single_obs_posterior=True, cell_input="stoch").eval()
    flat = {f"wm.rssm.{k}": v for k, v in flatten_module(ref).items()}
    m = _Mapper(flat)
    m.rssm("wm.rssm", "rssm", hidden=H, has_posterior=True, ensemble=1)
    params = {"params": m.tree["rssm"]}
    assert not m.missing, m.missing

    ours = RSSM(action_dim=A, embed_dim=E, ensemble=1, stoch=S, deter=H,
                hidden=H, discrete=K, norm="layer", single_obs_posterior=True,
                cell_input="stoch")

    embed = np.float32(rng.normal(size=(B, T, E)))
    action = np.float32(rng.normal(size=(B, T, A)))
    is_first = np.zeros((B, T), bool)
    is_first[:, 0] = True
    is_first[1, 3] = True

    # reference per-step loop with should_sample=False (observe() hard-codes
    # sampling; the deterministic path goes through obs_step directly)
    state = ref.initial(B)
    posts = []
    with torch.no_grad():
        for t in range(T):
            post, prior = ref.obs_step(
                state, torch.tensor(action[:, t]), torch.tensor(embed[:, t]),
                torch.tensor(is_first[:, t]), should_sample=False)
            posts.append(post)
            state = post
    ref_deter = np.stack([p["deter"].numpy() for p in posts], 1)
    ref_logit = np.stack([p["logit"].numpy() for p in posts], 1)

    post_f, _ = ours.apply(params, jnp.asarray(embed), jnp.asarray(action),
                           jnp.asarray(is_first), jax.random.PRNGKey(0),
                           should_sample=False, method="observe")
    np.testing.assert_allclose(np.asarray(post_f["deter"]), ref_deter, atol=2e-4)
    np.testing.assert_allclose(np.asarray(post_f["logit"]), ref_logit, atol=2e-3)


@pytest.mark.slow
def test_rssm_kl_loss_parity(rng):
    """kl_loss balancing/free-bits parity on identical stats."""
    B, T, S, K = 3, 5, 4, 4
    post_l = np.float32(rng.normal(size=(B, T, S, K)))
    prior_l = np.float32(rng.normal(size=(B, T, S, K)))
    ref = du.EnsembleRSSM(ensemble=1, stoch=S, deter=8, hidden=8, discrete=K,
                          action_dim=2, embed_dim=4, device="cpu")
    with torch.no_grad():
        ref_loss, _ = ref.kl_loss(
            {"logit": torch.tensor(post_l), "stoch": torch.tensor(post_l)},
            {"logit": torch.tensor(prior_l), "stoch": torch.tensor(prior_l)},
            forward=False, balance=0.8, free=1.0, free_avg=False)
    ours = RSSM(action_dim=2, embed_dim=4, ensemble=1, stoch=S, deter=8,
                hidden=8, discrete=K)
    dummy = jnp.zeros((1, 2))
    params = ours.init(jax.random.PRNGKey(0), {"logit": jnp.asarray(post_l)},
                       {"logit": jnp.asarray(prior_l)}, False, 0.8, 1.0, False,
                       method="kl_loss")
    loss, _ = ours.apply(params, {"logit": jnp.asarray(post_l)},
                         {"logit": jnp.asarray(prior_l)}, False, 0.8, 1.0, False,
                         method="kl_loss")
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-4)


@pytest.mark.slow
def test_encoder_parity(rng):
    """Reference conv Encoder forward == ours after conv-kernel transplant
    (validates the Conv2d OIHW->HWIO map and ImgChLayerNorm equivalence)."""
    from genrl_tpu.models.encoder import Encoder

    shapes = {"observation": (3, 16, 16)}  # reference CHW spec
    ref = du.Encoder(shapes, cnn_keys="observation", mlp_keys="$^",
                     norm="layer", cnn_depth=8, cnn_kernels=(4, 4)).eval()
    flat = {f"wm.encoder.{k}": v for k, v in flatten_module(ref).items()}
    m = _Mapper(flat)
    m.encoder("wm.encoder", "encoder", n_convs=2)
    params = {"params": m.tree["encoder"]}

    obs = np.float32(rng.normal(size=(2, 5, 3, 16, 16)) * 0.4)
    with torch.no_grad():
        ref_out = ref({"observation": torch.tensor(obs)}).numpy()

    ours = Encoder(shapes=(("observation", (16, 16, 3)),), cnn_keys="observation",
                   mlp_keys="$^", norm="layer", cnn_depth=8, cnn_kernels=(4, 4))
    out = np.asarray(ours.apply(
        params, {"observation": jnp.asarray(obs.transpose(0, 1, 3, 4, 2))}))
    np.testing.assert_allclose(out, ref_out, atol=2e-4)


@pytest.mark.slow
def test_decoder_parity(rng):
    """Reference ConvTranspose Decoder == ours after transplant (validates
    the IOHW->HWOI transpose_kernel map and the conv_in reward-feature space)."""
    from genrl_tpu.models.decoder import Decoder

    shapes = {"observation": (3, 16, 16)}
    E = 12
    ref = du.Decoder(shapes, cnn_keys="observation", mlp_keys="$^",
                     norm="layer", cnn_depth=8, cnn_kernels=(6, 6),
                     embed_dim=E).eval()
    flat = {f"wm.heads.decoder.{k}": v for k, v in flatten_module(ref).items()}
    m = _Mapper(flat)
    m.decoder("wm.heads.decoder", "decoder", n_convs=2)
    params = {"params": m.tree["decoder"]}

    feats = np.float32(rng.normal(size=(2, 5, E)))
    with torch.no_grad():
        ref_mean = ref(torch.tensor(feats))["observation"].mean.numpy()

    ours = Decoder(shapes=(("observation", (16, 16, 3)),), cnn_keys="observation",
                   mlp_keys="$^", norm="layer", cnn_depth=8, cnn_kernels=(6, 6))
    out = ours.apply(params, jnp.asarray(feats))["observation"].mean
    np.testing.assert_allclose(np.asarray(out),
                               ref_mean.transpose(0, 1, 3, 4, 2), atol=3e-4)


@pytest.mark.slow
def test_actor_head_parity(rng):
    """Reference MLP actor ('normal' DistLayer) mean/std == ours after
    transplant (validates dense/norm/head + std-transform mapping)."""
    from genrl_tpu.models.layers import MLPHead

    F_, A = 20, 5
    ref = du.MLP(F_, A, layers=2, units=24, norm="layer", dist="normal",
                 min_std=0.1).eval()
    flat = {f"actor.{k}": v for k, v in flatten_module(ref).items()}
    m = _Mapper(flat)
    m.mlp_head("actor", "", layers=2, has_std=True)
    params = {"params": m.tree}

    x = np.float32(rng.normal(size=(3, F_)))
    with torch.no_grad():
        ref_dist = ref(torch.tensor(x))
        ref_mean = ref_dist.mean.numpy()
        ref_std = ref_dist.base_dist.scale.numpy()

    ours = MLPHead(shape=(A,), layers=2, units=24, norm="layer", dist="normal",
                   min_std=0.1)
    dist = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dist.mean), ref_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist.std), ref_std, atol=1e-5)
