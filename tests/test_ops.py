"""Op-level parity tests against PyTorch functional ops.

These pin the exact `F.interpolate` / `PixelShuffle` / Conv2d semantics the reference
relies on (SURVEY.md §7.3 'hard parts'): bilinear align_corners=False, legacy nearest,
area (adaptive avg pool), torch PixelShuffle channel order, and the ConvLSTM gate math
(/root/reference/src/models/convlstm.py:16-28)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from pl_convlstm_gan_tpu.ops import (
    add_coord_channels, resize_bilinear, resize_nearest, resize_area, pixel_shuffle,
    convlstm_gates,
)
from pl_convlstm_gan_tpu.ops.convlstm import ConvLSTMParams, convlstm_step_xla
from pl_convlstm_gan_tpu.ops.nn import conv2d, hwio_from_oihw


def nchw(x_nhwc):
    return np.moveaxis(np.asarray(x_nhwc), -1, -3)


def nhwc(x_nchw):
    return np.moveaxis(np.asarray(x_nchw), -3, -1)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (256, 256)), ((15, 12), (120, 96)),
                                          ((17, 23), (51, 46)), ((64, 64), (40, 40))])
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = resize_bilinear(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(torch.from_numpy(nchw(x)), size=out_hw, mode="bilinear",
                           align_corners=False, antialias=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs.numpy()), atol=3e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (256, 256)), ((7, 9), (20, 31)),
                                          ((20, 31), (7, 9))])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 4), dtype=np.float32)
    ours = resize_nearest(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(torch.from_numpy(nchw(x)), size=out_hw, mode="nearest")
    np.testing.assert_array_equal(np.asarray(ours), nhwc(theirs.numpy()))


@pytest.mark.parametrize("in_hw,out_hw", [((256, 256), (32, 32)), ((120, 96), (15, 12)),
                                          ((50, 47), (15, 12))])
def test_area_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 1), dtype=np.float32)
    ours = resize_area(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(torch.from_numpy(nchw(x)), size=out_hw, mode="area")
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs.numpy()), atol=1e-5)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_shuffle_matches_torch(rng, r):
    x = rng.standard_normal((2, 5, 7, 4 * r * r), dtype=np.float32)
    ours = pixel_shuffle(jnp.asarray(x), r)
    theirs = F.pixel_shuffle(torch.from_numpy(nchw(x)), r)
    np.testing.assert_array_equal(np.asarray(ours), nhwc(theirs.numpy()))


def test_coord_channels_match_torch_linspace(rng):
    x = rng.standard_normal((2, 9, 13, 1), dtype=np.float32)
    out = np.asarray(add_coord_channels(jnp.asarray(x)))
    row = torch.linspace(0, 1, 9).view(1, 1, 9, 1).repeat(2, 1, 1, 13).numpy()
    col = torch.linspace(0, 1, 13).view(1, 1, 1, 13).repeat(2, 1, 9, 1).numpy()
    np.testing.assert_allclose(out[..., 0], x[..., 0])
    np.testing.assert_allclose(out[..., 1], row[:, 0], atol=1e-7)
    np.testing.assert_allclose(out[..., 2], col[:, 0], atol=1e-7)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 6), dtype=np.float32)
    w = rng.standard_normal((8, 6, 3, 3), dtype=np.float32) * 0.1  # torch OIHW
    b = rng.standard_normal(8, dtype=np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(hwio_from_oihw(w)), jnp.asarray(b),
                  padding=1)
    theirs = F.conv2d(torch.from_numpy(nchw(x)), torch.from_numpy(w),
                      torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs.numpy()), atol=1e-4)


def test_convlstm_step_matches_torch_math(rng):
    """Full cell step vs an inline torch computation of the reference math."""
    b_, h_, w_, cin, ch = 2, 8, 8, 3, 4
    x = rng.standard_normal((b_, h_, w_, cin), dtype=np.float32)
    h0 = rng.standard_normal((b_, h_, w_, ch), dtype=np.float32)
    c0 = rng.standard_normal((b_, h_, w_, ch), dtype=np.float32)
    w_oihw = (rng.standard_normal((4 * ch, cin + ch, 3, 3), dtype=np.float32) * 0.1)
    bias = rng.standard_normal(4 * ch, dtype=np.float32)

    params = ConvLSTMParams(jnp.asarray(hwio_from_oihw(w_oihw)), jnp.asarray(bias))
    h1, c1 = convlstm_step_xla(params, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))

    xt = torch.from_numpy(nchw(x))
    ht = torch.from_numpy(nchw(h0))
    ct = torch.from_numpy(nchw(c0))
    z = F.conv2d(torch.cat([xt, ht], 1), torch.from_numpy(w_oihw),
                 torch.from_numpy(bias), padding=1)
    zi, zf, zo, zg = torch.split(z, ch, dim=1)
    c_next = torch.sigmoid(zf) * ct + torch.sigmoid(zi) * torch.tanh(zg)
    h_next = torch.sigmoid(zo) * torch.tanh(c_next)

    np.testing.assert_allclose(np.asarray(h1), nhwc(h_next.numpy()), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), nhwc(c_next.numpy()), atol=1e-5)


def test_convlstm_gates_shapes(rng):
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 16), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((2, 4, 4, 4), dtype=np.float32))
    h1, c1 = convlstm_gates(z, c)
    assert h1.shape == c.shape and c1.shape == c.shape


@pytest.mark.parametrize("scale", [1.5, 2.5])
def test_bilinear_scale_factor_matches_torch(rng, scale):
    """Fractional upscale parity (the generator's non-power-of-2 remainder path,
    reference generator.py:179-185 uses scale_factor= upsampling)."""
    x = rng.standard_normal((1, 12, 10, 2), dtype=np.float32)
    out_h, out_w = int(12 * scale), int(10 * scale)
    ours = resize_bilinear(jnp.asarray(x), out_h, out_w)
    theirs = F.interpolate(torch.from_numpy(nchw(x)), scale_factor=scale,
                           mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs.numpy()), atol=3e-5)


def test_resize_identity_shortcircuit(rng):
    x = jnp.asarray(rng.standard_normal((1, 7, 7, 3), dtype=np.float32))
    for fn in (resize_bilinear, resize_nearest, resize_area):
        assert fn(x, 7, 7) is x


def test_resize_randomized_parity_sweep(rng):
    """Randomized shape/scale sweep of all three resize modes vs torch
    F.interpolate — guards the subtlest parity surface (edge semantics,
    non-integer ratios, up AND down)."""
    import torch.nn.functional as TF
    modes = (("bilinear", resize_bilinear, dict(mode="bilinear",
                                                align_corners=False)),
             ("nearest", resize_nearest, dict(mode="nearest")),
             ("area", resize_area, dict(mode="area")))
    for trial in range(12):
        h_in = int(rng.integers(3, 40))
        w_in = int(rng.integers(3, 40))
        h_out = int(rng.integers(2, 64))
        w_out = int(rng.integers(2, 64))
        x = rng.standard_normal((2, h_in, w_in, 3), dtype=np.float32)
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        for name, ours_fn, tkw in modes:
            if name == "area" and (h_in % h_out or w_in % w_out):
                # torch 'area' == adaptive avg-pool only when sizes divide
                # evenly; the framework only uses it in that regime
                # (conservation loss: HR is an integer multiple of LR)
                continue
            ours = np.asarray(ours_fn(jnp.asarray(x), h_out, w_out))
            theirs = TF.interpolate(xt, size=(h_out, w_out), **tkw).numpy()
            np.testing.assert_allclose(
                ours, np.transpose(theirs, (0, 2, 3, 1)), atol=1e-5,
                err_msg=f"{name} {h_in}x{w_in}->{h_out}x{w_out} (trial {trial})")
