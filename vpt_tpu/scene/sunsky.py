"""Procedural Preetham sun-sky environment map.

Vectorized numpy re-derivation of make_sunsky
(/root/reference/libs/yocto/yocto_image.cpp:617-760) and add_sky
(yocto_scene.cpp:683-691): Preetham zenith chromaticity/luminance
polynomials, Perez sky model in xyY, optional solar disk with the standard
atmospheric transmittance terms, constant ground from integrated sky
irradiance times albedo.
"""

from __future__ import annotations

import numpy as np

from .schema import Environment, Texture

_XYZ_TO_RGB = np.array([
    [+3.2406, -1.5372, -0.4986],
    [-0.9689, +1.8758, +0.0415],
    [+0.0557, -0.2040, +1.0570],
], np.float32)


def _xyY_to_xyz(xyY):
    x, y, Y = xyY[..., 0], xyY[..., 1], xyY[..., 2]
    ok = y != 0
    ys = np.where(ok, y, 1.0)
    out = np.stack([x * Y / ys, Y, (1 - x - y) * Y / ys], axis=-1)
    return np.where(ok[..., None], out, 0.0)


def make_sunsky(width: int, height: int, sun_angle: float,
                turbidity: float = 3.0, has_sun: bool = False,
                sun_intensity: float = 1.0, sun_radius: float = 1.0,
                ground_albedo=(0.2, 0.2, 0.2)) -> np.ndarray:
    """(H, W, 4) float32 linear HDR equirect sky. sun_angle = solar
    elevation's zenith angle theta_sun in [0, pi/2]."""
    t = turbidity
    ts = sun_angle

    def poly(c3, c2, c1, c0):
        return c3 * ts ** 3 + c2 * ts ** 2 + c1 * ts + c0

    zenith = np.array([
        poly(+0.00165, -0.00374, 0.00208, 0.0) * t * t
        + poly(-0.02902, 0.06377, -0.03202, 0.00394) * t
        + poly(+0.11693, -0.21196, 0.06052, 0.25885),
        poly(+0.00275, -0.00610, 0.00316, 0.0) * t * t
        + poly(-0.04214, 0.08970, -0.04153, 0.00515) * t
        + poly(+0.15346, -0.26756, 0.06669, 0.26688),
        1000 * (4.0453 * t - 4.9710)
        * np.tan((4.0 / 9.0 - t / 120.0) * (np.pi - 2 * ts))
        - 0.2155 * t + 2.4192,
    ], np.float32)

    A = np.array([-0.01925 * t - 0.25922, -0.01669 * t - 0.26078,
                  +0.17872 * t - 1.46303], np.float32)
    B = np.array([-0.06651 * t + 0.00081, -0.09495 * t + 0.00921,
                  -0.35540 * t + 0.42749], np.float32)
    C = np.array([-0.00041 * t + 0.21247, -0.00792 * t + 0.21023,
                  -0.02266 * t + 5.32505], np.float32)
    D = np.array([-0.06409 * t - 0.89887, -0.04405 * t - 1.65369,
                  +0.12064 * t - 2.57705], np.float32)
    E = np.array([-0.00325 * t + 0.04517, -0.01092 * t + 0.05291,
                  -0.06696 * t + 0.37027], np.float32)

    def perez(theta, gamma):
        th = theta[..., None]
        ga = gamma[..., None]
        num = (1 + A * np.exp(B / np.cos(th))) * (
            1 + C * np.exp(D * ga) + E * np.cos(ga) ** 2)
        den = (1 + A * np.exp(B)) * (
            1 + C * np.exp(D * ts) + E * np.cos(ts) ** 2)
        return zenith * num / den

    def sky_rgb(theta, gamma):
        xyz = _xyY_to_xyz(perez(theta, gamma))
        return np.einsum("ij,...j->...i", _XYZ_TO_RGB, xyz) / 10000.0

    # solar transmittance (Preetham)
    sun_ko = np.array([0.48, 0.75, 0.14], np.float32)
    sun_kg = np.array([0.1, 0.0, 0.0], np.float32)
    sun_kwa = np.array([0.02, 0.0, 0.0], np.float32)
    sun_sol = np.array([20000.0, 27000.0, 30000.0], np.float32)
    sun_lambda = np.array([680.0, 530.0, 480.0], np.float32)
    beta = 0.04608365822050 * t - 0.04586025928522
    m = 1.0 / (np.cos(ts) + 0.000940 * (1.6386 - ts) ** -1.253)
    tauR = np.exp(-m * 0.008735 * (sun_lambda / 1000) ** -4.08)
    tauA = np.exp(-m * beta * (sun_lambda / 1000) ** -1.3)
    tauO = np.exp(-m * sun_ko * 0.35)
    tauG = np.exp(-1.41 * sun_kg * m / (1 + 118.93 * sun_kg * m) ** 0.45)
    tauWA = np.exp(-0.2385 * sun_kwa * 2.0 * m
                   / (1 + 20.07 * sun_kwa * 2.0 * m) ** 0.45)
    sun_le = sun_sol * tauR * tauA * tauO * tauG * tauWA * 10000
    sun_le = sun_le * sun_intensity
    sun_angular_radius = max(
        9.35e-3 / 2 * sun_radius, 2 * np.pi / height)
    sun_dir = np.array([0, np.cos(ts), np.sin(ts)], np.float32)

    img = np.zeros((height, width, 4), np.float32)
    img[..., 3] = 1.0
    j = np.arange(height // 2)
    theta = np.clip(np.pi * (j + 0.5) / height, 0.0, np.pi / 2 - 1e-5)
    i = np.arange(width)
    phi = 2 * np.pi * (i + 0.5) / width
    st, ct = np.sin(theta)[:, None], np.cos(theta)[:, None]
    w = np.stack([
        np.cos(phi)[None, :] * st, np.broadcast_to(ct, (len(j), width)),
        np.sin(phi)[None, :] * st], axis=-1)
    gamma = np.arccos(np.clip(w @ sun_dir, -1.0, 1.0))
    col = sky_rgb(np.broadcast_to(theta[:, None], gamma.shape), gamma)
    if has_sun:
        disk = gamma < sun_angular_radius
        col = col + np.where(disk[..., None], sun_le / 10000.0, 0.0)
    img[: height // 2, :, :3] = col

    ga = np.asarray(ground_albedo, np.float32)
    if np.any(ga != 0):
        angle = np.sin(theta)[:, None, None] * 4 * np.pi / (width * height)
        ground = (col * (ga / np.pi) * np.cos(theta)[:, None, None]
                  * angle).sum((0, 1))
        img[height // 2:, :, :3] = ground
    return img


def add_sky(scene, sun_angle: float = np.pi / 4):
    """add_sky (yocto_scene.cpp:683-691): sunsky texture + environment."""
    img = make_sunsky(1024, 512, sun_angle)
    scene.textures.append(Texture(
        width=1024, height=512, linear=True, pixels=img, name="sky"))
    scene.environments.append(Environment(
        frame=np.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0],
                         np.float32).reshape(4, 3),
        emission=np.ones(3, np.float32),
        emission_tex=len(scene.textures) - 1, name="sky"))
    return scene
