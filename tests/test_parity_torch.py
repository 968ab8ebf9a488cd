"""Full-model numerical parity: our Generator vs the reference semantics computed
functionally in torch with IDENTICAL weights (the BASELINE.json north-star
correctness bar: "per-frame outputs match the PyTorch reference to tolerance on
test/test_model.py workloads").

The torch side below is a functional transcription of the documented reference
data flow (SURVEY.md §3.3): coordconv -> init conv -> 2 ConvLSTM cells ->
PixelShuffle upsample chain -> bilinear/nearest covariate resize -> sigmoid-gate
attention -> conv head — driven by the weights exported from OUR flax params."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pl_convlstm_gan_tpu.models import Generator


def _t(w_hwio):
    """HWIO (ours) -> torch OIHW."""
    return torch.from_numpy(np.transpose(np.asarray(w_hwio), (3, 2, 0, 1))).float()


def _b(bias):
    return torch.from_numpy(np.asarray(bias)).float()


def torch_reference_forward(params, rain_lr, dem, lu, scale=8, hidden=(16, 32)):
    """Reference-semantics forward in torch from our param pytree (NCHW)."""
    p = params["params"]
    x_seq = torch.from_numpy(rain_lr).float()
    dem_t = torch.from_numpy(dem).float()
    lu_t = torch.from_numpy(lu).float()
    b, t, _, h, w = x_seq.shape
    final = (h * scale, w * scale)

    dem_hr = F.interpolate(dem_t, size=final, mode="bilinear", align_corners=False)
    lu_hr = F.interpolate(lu_t, size=final, mode="nearest")

    def conv(name, x, padding=1):
        return F.conv2d(x, _t(p[name]["kernel"]), _b(p[name]["bias"]),
                        padding=padding)

    def cell(prefix, x, h_, c_):
        z = F.conv2d(torch.cat([x, h_], 1), _t(p["recurrence"][prefix]["kernel"]),
                     _b(p["recurrence"][prefix]["bias"]), padding=1)
        ch = h_.shape[1]
        zi, zf, zo, zg = torch.split(z, ch, 1)
        c_n = torch.sigmoid(zf) * c_ + torch.sigmoid(zi) * torch.tanh(zg)
        h_n = torch.sigmoid(zo) * torch.tanh(c_n)
        return h_n, c_n

    def attention(name, x, cov):
        a = F.conv2d(cov, _t(p[name]["conv_reduce"]["kernel"]),
                     _b(p[name]["conv_reduce"]["bias"]), padding=1)
        a = F.relu(a)
        a = F.conv2d(a, _t(p[name]["conv_gate"]["kernel"]),
                     _b(p[name]["conv_gate"]["bias"]))
        return x * torch.sigmoid(a)

    h1 = torch.zeros(b, hidden[0], h, w)
    c1 = torch.zeros_like(h1)
    h2 = torch.zeros(b, hidden[1], h, w)
    c2 = torch.zeros_like(h2)
    n_blocks = {8: 3, 4: 2, 2: 1}[scale]

    row = torch.linspace(0, 1, h).view(1, 1, h, 1).repeat(b, 1, 1, w)
    col = torch.linspace(0, 1, w).view(1, 1, 1, w).repeat(b, 1, h, 1)

    outs = []
    for ti in range(t):
        x = torch.cat([x_seq[:, ti], row, col], 1)
        x = F.relu(conv("init_conv", x))
        h1, c1 = cell("cell1", x, h1, c1)
        h2, c2 = cell("cell2", h1, h2, c2)
        feat = h2
        for bi in range(n_blocks):
            up = p[f"upsample_{bi}"]["conv"]
            feat = F.conv2d(feat, _t(up["kernel"]), _b(up["bias"]), padding=1)
            feat = F.relu(F.pixel_shuffle(feat, 2))
        feat = attention("dem_attn", feat, dem_hr)
        feat = attention("lu_attn", feat, lu_hr)
        out = F.relu(conv("post_conv1", feat))
        out = conv("post_conv2", out)
        outs.append(out.unsqueeze(1))
    return torch.cat(outs, 1)


def test_generator_full_parity_with_loaded_weights(rng):
    b, t, h, w, lu_c, scale = 2, 5, 16, 16, 5, 8
    rain = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    dem = rng.standard_normal((b, 1, h, w), dtype=np.float32)
    lu = rng.standard_normal((b, lu_c, h, w), dtype=np.float32)

    model = Generator(hidden_dims=(16, 32), lu_channels=lu_c, scale_factor=scale)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(rain),
                        jnp.asarray(dem), jnp.asarray(lu))

    ours = np.asarray(model.apply(params, jnp.asarray(rain), jnp.asarray(dem),
                                  jnp.asarray(lu)))
    theirs = torch_reference_forward(
        jax.tree_util.tree_map(np.asarray, params), rain, dem, lu,
        scale=scale).numpy()

    assert ours.shape == theirs.shape == (b, t, 1, h * scale, w * scale)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-4)


def test_generator_parity_scale4(rng):
    b, t, h, w, lu_c, scale = 1, 3, 8, 8, 3, 4
    rain = rng.standard_normal((b, t, 1, h, w), dtype=np.float32)
    dem = rng.standard_normal((b, 1, h, w), dtype=np.float32)
    lu = rng.standard_normal((b, lu_c, h, w), dtype=np.float32)
    model = Generator(hidden_dims=(16, 32), lu_channels=lu_c, scale_factor=scale)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(rain),
                        jnp.asarray(dem), jnp.asarray(lu))
    ours = np.asarray(model.apply(params, jnp.asarray(rain), jnp.asarray(dem),
                                  jnp.asarray(lu)))
    theirs = torch_reference_forward(
        jax.tree_util.tree_map(np.asarray, params), rain, dem, lu,
        scale=scale).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-4)
