"""Zoo model parity vs reference torch implementations (random reference
weights converted through our converters; forward deltas must be tiny)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import enable_reference_imports, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

RNG = np.random.default_rng(11)


def _x(b=2):
    return RNG.standard_normal((b, 27, 17, 3)).astype(np.float32)


@pytest.mark.parametrize("variant", ["base", "tcn", "hierarchical", "graph_only"])
def test_motionagformer_parity(variant):
    torch = pytest.importorskip("torch")
    enable_reference_imports()
    from model.MotionAGFormer import MotionAGFormer as TorchMAG

    from kasportsformer_tpu.models.zoo.motionagformer import (
        MotionAGFormer,
        MotionAGFormerConfig,
    )
    from kasportsformer_tpu.train.checkpoint import (
        motionagformer_state_dict_to_params,
    )

    kwargs = dict(n_layers=3, dim_in=3, dim_feat=32, dim_rep=64, num_heads=4,
                  n_frames=27)
    cfg_kwargs = dict(n_layers=3, dim_feat=32, dim_rep=64, num_heads=4,
                      n_frames=27)
    if variant == "tcn":
        kwargs["use_tcn"] = cfg_kwargs["use_tcn"] = True
    elif variant == "hierarchical":
        kwargs["hierarchical"] = cfg_kwargs["hierarchical"] = True
    elif variant == "graph_only":
        kwargs["graph_only"] = cfg_kwargs["graph_only"] = True

    torch.manual_seed(5)
    tmodel = TorchMAG(**kwargs)
    tmodel.eval()

    params, state = motionagformer_state_dict_to_params(
        tmodel.state_dict(), n_layers=3,
        graph_only=kwargs.get("graph_only", False),
        use_tcn=kwargs.get("use_tcn", False),
        hierarchical=kwargs.get("hierarchical", False))
    jmodel = MotionAGFormer(MotionAGFormerConfig(**cfg_kwargs))

    x = _x()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got, _ = jax.jit(lambda p, s, v: jmodel.apply(p, s, v, train=False))(
        params, state, jnp.asarray(x))
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # param counts agree
    want_n = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)
    assert jmodel.parameter_count(params) == want_n
