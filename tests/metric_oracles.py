"""Slow, from-the-paper numpy/scipy oracles for FSIM and GMSD.

Independent code paths from m2trans_tpu.metrics (explicit per-orientation /
per-scale loops, spatial-domain noise estimation via real(ifft2(filter)),
numpy fft) re-derived from the publications:

  * FSIM: Zhang, Zhang, Mou, Zhang, "FSIM: A Feature Similarity Index for
    Image Quality Assessment", IEEE TIP 2011 — with the phase congruency
    of Kovesi, "Image Features From Phase Congruency" (phasecong2, as
    embedded in the authors' FSIM.m: nscale=4, norient=4, minWaveLength=6,
    mult=2, sigmaOnf=0.55, dThetaOnSigma=1.2, k=2, epsilon=1e-4, the /1.7
    empirical noise-threshold correction, and the summed-orientation
    PC = EnergyAll/AnAll variant without the sigmoid weighting).
  * GMSD: Xue, Zhang, Mou, Bovik, "Gradient Magnitude Similarity
    Deviation", IEEE TIP 2014 — 2x2 average-pool, Prewitt/3, c=170 (on
    a 0-255 scale), population std of the GMS map.

Where the reference's harness (piq, reference test.py:95-99; not
installable in this image) deviates from the papers, we replicate piq's
documented behavior: anchored avg-pool downsampling, abs() in the
chromatic power, shared bottom/right zero pad for odd GMSD inputs.
"""

import math

import numpy as np


# --------------------------------------------------------------------------
# phase congruency (Kovesi phasecong2, FSIM.m-embedded variant)
# --------------------------------------------------------------------------


def _matlab_freq_grid(n: int) -> np.ndarray:
    if n % 2:
        return (np.arange(n) - (n - 1) / 2.0) / (n - 1)
    return (np.arange(n) - n / 2.0) / n


def oracle_phase_congruency(im: np.ndarray, nscale: int = 4,
                            norient: int = 4, min_wavelength: float = 6.0,
                            mult: float = 2.0, sigma_onf: float = 0.55,
                            d_theta_on_sigma: float = 1.2,
                            k: float = 2.0) -> np.ndarray:
    rows, cols = im.shape
    eps = 1e-4
    imfft = np.fft.fft2(im.astype(np.float64))

    fx = _matlab_freq_grid(cols)
    fy = _matlab_freq_grid(rows)
    xg, yg = np.meshgrid(fx, fy)
    radius = np.fft.ifftshift(np.sqrt(xg ** 2 + yg ** 2))
    theta = np.fft.ifftshift(np.arctan2(-yg, xg))
    radius[0, 0] = 1.0

    # butterworth lowpass, cutoff .45 order 15
    lp = np.fft.ifftshift(
        1.0 / (1.0 + (np.sqrt(xg ** 2 + yg ** 2) / 0.45) ** 30))

    log_gabor = []
    for s in range(nscale):
        fo = 1.0 / (min_wavelength * mult ** s)
        g = np.exp(-np.log(radius / fo) ** 2
                   / (2.0 * math.log(sigma_onf) ** 2)) * lp
        g[0, 0] = 0.0
        log_gabor.append(g)

    theta_sigma = math.pi / norient / d_theta_on_sigma
    sin_t, cos_t = np.sin(theta), np.cos(theta)

    energy_all = np.zeros((rows, cols))
    an_all = np.zeros((rows, cols))

    for o in range(norient):
        angl = o * math.pi / norient
        ds = sin_t * math.cos(angl) - cos_t * math.sin(angl)
        dc = cos_t * math.cos(angl) + sin_t * math.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spread = np.exp(-dtheta ** 2 / (2.0 * theta_sigma ** 2))

        eo = []
        ifft_filters = []
        sum_e = np.zeros((rows, cols))
        sum_o = np.zeros((rows, cols))
        sum_an = np.zeros((rows, cols))
        em_n = 0.0
        for s in range(nscale):
            filt = log_gabor[s] * spread
            # spatial filter for the noise estimate, exactly as
            # phasecong2.m does it (NOT via Parseval like the jax impl)
            ifft_filters.append(np.real(np.fft.ifft2(filt))
                                * math.sqrt(rows * cols))
            response = np.fft.ifft2(imfft * filt)
            eo.append(response)
            sum_an += np.abs(response)
            sum_e += response.real
            sum_o += response.imag
            if s == 0:
                em_n = np.sum(filt ** 2)

        x_energy = np.sqrt(sum_e ** 2 + sum_o ** 2) + eps
        mean_e, mean_o = sum_e / x_energy, sum_o / x_energy
        energy = np.zeros((rows, cols))
        for s in range(nscale):
            e, od = eo[s].real, eo[s].imag
            energy += e * mean_e + od * mean_o - np.abs(e * mean_o
                                                        - od * mean_e)

        median_e2n = np.median(np.abs(eo[0]) ** 2)
        mean_e2n = -median_e2n / math.log(0.5)
        noise_power = mean_e2n / em_n

        est_sum_an2 = 0.0
        for s in range(nscale):
            est_sum_an2 += np.sum(ifft_filters[s] ** 2)
        est_sum_aiaj = 0.0
        for si in range(nscale):
            for sj in range(si + 1, nscale):
                est_sum_aiaj += np.sum(ifft_filters[si] * ifft_filters[sj])

        est_noise_energy2 = (2.0 * noise_power * est_sum_an2
                             + 4.0 * noise_power * est_sum_aiaj)
        tau = math.sqrt(est_noise_energy2 / 2.0)
        est_noise_energy = tau * math.sqrt(math.pi / 2.0)
        est_noise_sigma = math.sqrt((2.0 - math.pi / 2.0) * tau ** 2)
        t = (est_noise_energy + k * est_noise_sigma) / 1.7

        energy_all += np.maximum(energy - t, 0.0)
        an_all += sum_an

    return energy_all / (an_all + eps)


# --------------------------------------------------------------------------
# FSIM
# --------------------------------------------------------------------------

_YIQ = np.array([[0.299, 0.587, 0.114],
                 [0.5959, -0.2746, -0.3213],
                 [0.2115, -0.5227, 0.3112]])

_SCHARR = np.array([[3.0, 0.0, -3.0],
                    [10.0, 0.0, -10.0],
                    [3.0, 0.0, -3.0]]) / 16.0


def _conv_same_zero(img: np.ndarray, kern: np.ndarray) -> np.ndarray:
    kh, kw = kern.shape
    ph, pw = kh // 2, kw // 2
    padded = np.pad(img, ((ph, ph), (pw, pw)))
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kern[i, j] * padded[i:i + img.shape[0],
                                       j:j + img.shape[1]]
    return out


def _avg_pool(img: np.ndarray, f: int) -> np.ndarray:
    h, w = img.shape
    img = img[: h // f * f, : w // f * f]
    return img.reshape(h // f, f, w // f, f).mean(axis=(1, 3))


def oracle_fsim(x: np.ndarray, y: np.ndarray, data_range: float = 1.0,
                chromatic: bool = True) -> float:
    """x, y: (H, W, 3) RGB or (H, W) grayscale in [0, data_range]."""
    x = np.asarray(x, np.float64) / data_range * 255.0
    y = np.asarray(y, np.float64) / data_range * 255.0
    if x.ndim == 3 and x.shape[-1] == 3:
        x = x @ _YIQ.T
        y = y @ _YIQ.T
    else:
        x = np.stack([x, x, x], axis=-1)
        y = np.stack([y, y, y], axis=-1)

    f = max(1, round(min(x.shape[0], x.shape[1]) / 256))
    if f > 1:
        x = np.stack([_avg_pool(x[..., c], f) for c in range(3)], axis=-1)
        y = np.stack([_avg_pool(y[..., c], f) for c in range(3)], axis=-1)

    pc1 = oracle_phase_congruency(x[..., 0])
    pc2 = oracle_phase_congruency(y[..., 0])

    def grad_mag(img):
        gx = _conv_same_zero(img, _SCHARR)
        gy = _conv_same_zero(img, _SCHARR.T)
        return np.sqrt(gx ** 2 + gy ** 2)

    g1, g2 = grad_mag(x[..., 0]), grad_mag(y[..., 0])

    t1, t2, t3, t4, lam = 0.85, 160.0, 200.0, 200.0, 0.03
    s_pc = (2.0 * pc1 * pc2 + t1) / (pc1 ** 2 + pc2 ** 2 + t1)
    s_g = (2.0 * g1 * g2 + t2) / (g1 ** 2 + g2 ** 2 + t2)
    s_l = s_pc * s_g
    if chromatic:
        s_i = ((2.0 * x[..., 1] * y[..., 1] + t3)
               / (x[..., 1] ** 2 + y[..., 1] ** 2 + t3))
        s_q = ((2.0 * x[..., 2] * y[..., 2] + t4)
               / (x[..., 2] ** 2 + y[..., 2] ** 2 + t4))
        s_l = s_l * np.abs(s_i * s_q) ** lam
    pcm = np.maximum(pc1, pc2)
    return float(np.sum(s_l * pcm) / np.sum(pcm))


# --------------------------------------------------------------------------
# GMSD
# --------------------------------------------------------------------------

_PREWITT = np.array([[1.0, 0.0, -1.0],
                     [1.0, 0.0, -1.0],
                     [1.0, 0.0, -1.0]]) / 3.0


def oracle_gmsd(x: np.ndarray, y: np.ndarray,
                data_range: float = 1.0) -> float:
    """x, y: (H, W, 3) RGB or (H, W) in [0, data_range]."""
    x = np.asarray(x, np.float64) / data_range
    y = np.asarray(y, np.float64) / data_range
    if x.ndim == 3 and x.shape[-1] == 3:
        x = x @ _YIQ[0]
        y = y @ _YIQ[0]

    pad = max(x.shape[0] % 2, x.shape[1] % 2)
    if pad:  # piq quirk: both dims padded with zeros by the shared amount
        x = np.pad(x, ((0, pad), (0, pad)))
        y = np.pad(y, ((0, pad), (0, pad)))
    x = _avg_pool(x, 2)
    y = _avg_pool(y, 2)

    def grad_mag(img):
        gx = _conv_same_zero(img, _PREWITT)
        gy = _conv_same_zero(img, _PREWITT.T)
        return np.sqrt(gx ** 2 + gy ** 2)

    gm_x, gm_y = grad_mag(x), grad_mag(y)
    c = 170.0 / 255.0 ** 2
    gms = (2.0 * gm_x * gm_y + c) / (gm_x ** 2 + gm_y ** 2 + c)
    return float(np.sqrt(np.mean((gms - np.mean(gms)) ** 2)))
