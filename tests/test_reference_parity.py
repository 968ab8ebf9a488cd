"""THE parity test: run the actual reference PyTorch Generator (imported read-only
from /root/reference) and our TPU-native Generator on the same inputs with the SAME
weights (transferred via tools/import_torch_checkpoint), and compare per-frame
outputs to tolerance — the BASELINE.json north-star correctness bar, on the
reference's own code and its test_model.py workloads.

Skipped automatically when the reference checkout is not present."""
import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")),
    reason="reference checkout not available")


def _import_reference_generator():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.models.generator import Generator as TorchGenerator  # noqa
    return TorchGenerator


@pytest.mark.parametrize("case", [
    # (B, T, H, W, lu_c, scale) — mirrors reference test_model.py:12-50 and :150-179
    (2, 5, 32, 32, 5, 8),
    (1, 3, 16, 16, 5, 4),
])
def test_generator_matches_reference_with_transferred_weights(case):
    import torch
    import jax.numpy as jnp
    from pl_convlstm_gan_tpu.models import Generator
    from pl_convlstm_gan_tpu.tools.import_torch_checkpoint import convert_state_dict

    b, t, h, w, lu_c, scale = case
    TorchGenerator = _import_reference_generator()

    torch.manual_seed(0)
    ref = TorchGenerator(hidden_dims=[16, 32], lu_channels=lu_c,
                         scale_factor=scale)

    rng = np.random.default_rng(42)
    rain = rng.standard_normal((b, t, 1, h, w)).astype(np.float32)
    dem = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    lu = rng.standard_normal((b, lu_c, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rain), torch.from_numpy(dem),
                      torch.from_numpy(lu)).numpy()

    # transfer the reference's (lazily initialized) weights into our model
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd)

    ours = Generator(hidden_dims=(16, 32), lu_channels=lu_c, scale_factor=scale)
    out = np.asarray(ours.apply(
        {"params": params["params"]}, jnp.asarray(rain), jnp.asarray(dem),
        jnp.asarray(lu)))

    assert out.shape == ref_out.shape == (b, t, 1, h * scale, w * scale)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-4)


def test_loss_matches_reference(rng):
    """CombinedLoss total + components vs the reference's own loss module
    (test_model.py:100-147 workload)."""
    import torch
    import jax.numpy as jnp
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from src.losses.combined_loss import CombinedLoss as TorchCombinedLoss  # noqa
    from pl_convlstm_gan_tpu.losses import combined_loss

    b, t, h_lr, w_lr = 2, 5, 32, 32
    scale = 8.0
    h, w = 256, 256
    pred = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    lr = rng.standard_normal((b, t, 1, h_lr, w_lr), dtype=np.float32)
    coords = rng.integers(0, min(h_lr, w_lr), (b, 5, 2))
    vals = np.abs(rng.standard_normal((b, t, 5), dtype=np.float32)) * 20

    ref_loss = TorchCombinedLoss(lambda_point=0.1, lambda_conserve=1.0)
    with torch.no_grad():
        ref_total, ref_parts = ref_loss(
            torch.from_numpy(pred), torch.from_numpy(lr),
            torch.from_numpy(coords), torch.from_numpy(vals), scale)

    total, parts = combined_loss(jnp.asarray(pred), jnp.asarray(lr),
                                 jnp.asarray(coords), jnp.asarray(vals), scale,
                                 lambda_point=0.1, lambda_conserve=1.0)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)
    for k in ("point", "conserve", "smooth", "temporal"):
        np.testing.assert_allclose(float(parts[k]), float(ref_parts[k]),
                                   rtol=1e-4, err_msg=k)
