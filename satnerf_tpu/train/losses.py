"""Loss terms for all pipeline variants, as pure jnp functions.

Semantics mirror the reference exactly (ref: baseline/components/loss.py:4-110
and semantic/components/loss.py:6-157); each function returns
``(scalar_loss, dict_of_terms)`` like the reference modules so logging matches.
All gating (beta epoch, depth drop, car-reg start) is applied by the caller
via multiplier masks so the jitted step never retraces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BETA_MIN = 0.05


def mse(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt):
    """ref: eval/utils/metrics.py:17-18."""
    return -10.0 * jnp.log10(mse(pred, gt))


# -- rgb losses -------------------------------------------------------------


def nerf_loss(results, gt_rgb):
    """Plain MSE (ref: loss.py:96-110 NerfLoss)."""
    loss_dict = {"coarse_color": mse(results["rgb"], gt_rgb)}
    return sum(loss_dict.values()), loss_dict


def solar_correction_terms(results, lambda_sc: float):
    """Shadow-NeRF solar-correction auxiliary terms (ref: loss.py:4-12).

    term2 pulls the sun-visibility prediction towards the (detached)
    transmittance along the solar ray; term3 encourages the weighted sun
    visibility to integrate to 1.
    """
    sun_sc = results["sun_sc"][..., 0]  # (B, S_sc)
    t_sc = jax.lax.stop_gradient(results["transparency_sc"])
    w_sc = jax.lax.stop_gradient(results["weights_sc"])
    term2 = jnp.sum((t_sc - sun_sc) ** 2, axis=-1)
    # term2 is a plain per-sample sum; under a strided sc ladder
    # (RenderConfig.sc_stride > 1) rescale it to the full-ladder count so
    # the objective's weighting is quadrature-invariant. term3 is already
    # an integral (weights carry the deltas) and needs no compensation.
    n_main = results["weights"].shape[-1]
    if sun_sc.shape[-1] != n_main:
        term2 = term2 * (n_main / sun_sc.shape[-1])
    term3 = 1.0 - jnp.sum(w_sc * sun_sc, axis=-1)
    return {
        "coarse_sc_term2": lambda_sc / 3.0 * jnp.mean(term2),
        "coarse_sc_term3": lambda_sc / 3.0 * jnp.mean(term3),
    }


def snerf_loss(results, gt_rgb, lambda_sc: float = 0.05, sc_enabled: bool = True):
    """MSE + solar correction (ref: loss.py:71-93 SNerfLoss)."""
    loss_dict = {"coarse_color": mse(results["rgb"], gt_rgb)}
    if lambda_sc > 0 and sc_enabled:
        loss_dict.update(solar_correction_terms(results, lambda_sc))
    return sum(loss_dict.values()), loss_dict


def composited_beta(results, beta_key: str = "beta",
                    detach_samples: bool = False):
    """beta composited along the ray + beta_min floor (ref: loss.py:16-19).

    ``detach_samples`` stops gradient through the beta SAMPLES only (the
    compositing weights keep theirs) — the semantic uncertainty loss's
    ``detach_beta_for_s`` contract."""
    w = results["weights"]
    beta = results[beta_key]
    if detach_samples:
        beta = jax.lax.stop_gradient(beta)
    return jnp.sum(w[..., None] * beta, axis=-2) + BETA_MIN


def uncertainty_aware_loss(results, gt_rgb):
    """SatNeRF transient-uncertainty RGB loss (ref: loss.py:16-27)."""
    beta = composited_beta(results)  # (B, 1)
    color = jnp.mean((results["rgb"] - gt_rgb) ** 2 / (2.0 * beta**2))
    logbeta = (3.0 + jnp.mean(jnp.log(beta))) / 2.0
    return {"coarse_color": color, "coarse_logbeta": logbeta}


def satnerf_loss(results, gt_rgb, lambda_sc: float = 0.0, sc_enabled: bool = True):
    """Uncertainty-aware + solar correction (ref: loss.py:52-68 SatNerfLoss)."""
    loss_dict = dict(uncertainty_aware_loss(results, gt_rgb))
    if lambda_sc > 0 and sc_enabled:
        loss_dict.update(solar_correction_terms(results, lambda_sc))
    return sum(loss_dict.values()), loss_dict


# -- depth supervision ------------------------------------------------------


def depth_loss(results, target_depths, weights=1.0, lambda_ds: float = 1.0):
    """Weighted MSE on rendered depth vs tie-point depth.

    ref: loss.py:30-49 DepthLoss (lambda_ds/3 scaling).
    """
    per_ray = (results["depth"] - target_depths) ** 2
    loss_dict = {"coarse_ds": (lambda_ds / 3.0) * jnp.mean(weights * per_ray)}
    return sum(loss_dict.values()), loss_dict


# -- semantic losses --------------------------------------------------------


def _masked_ce(logits, targets, mask):
    """Cross entropy averaged over masked rays (torch ignore_index semantics:
    excluded rays do not contribute to the mean)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(ce * mask) / count


def _semantic_mask(targets, ignore_mask, car_index: int, ignore_car: bool):
    mask = jnp.ones(targets.shape[0], dtype=jnp.float32)
    if ignore_mask is not None:
        mask = mask * ignore_mask.astype(jnp.float32)
    if ignore_car and car_index >= 0:
        mask = mask * (targets != car_index).astype(jnp.float32)
    return mask


def semantic_loss(
    results,
    targets,
    ignore_mask=None,
    lambda_s: float = 0.04,
    car_index: int = -1,
    ignore_car: bool = True,
):
    """lambda_s * CE(composited logits, labels) with car/sparsity masking.

    ref: semantic/components/loss.py:35-66 SemanticLoss.
    """
    targets = targets.reshape(-1).astype(jnp.int32)
    mask = _semantic_mask(targets, ignore_mask, car_index, ignore_car)
    ce = _masked_ce(results["semantic_logits"], targets, mask)
    loss_dict = {"coarse_semantic": lambda_s * ce}
    return sum(loss_dict.values()), loss_dict


def semantic_uncertainty_loss(
    results,
    targets,
    ignore_mask=None,
    lambda_s: float = 0.04,
    car_index: int = -1,
    ignore_car: bool = True,
    detach_beta: bool = False,
):
    """Uncertainty-weighted CE (ref: loss.py:6-32,69-114).

    The scalar CE is scaled by the mean of 1/(2*beta^2) over ALL rays (the
    reference divides the scalar CE by per-ray beta^2 then means). The
    logbeta regulariser is added only when a separate semantic beta head
    exists (otherwise it would double-count the RGB logbeta term).
    """
    targets = targets.reshape(-1).astype(jnp.int32)
    mask = _semantic_mask(targets, ignore_mask, car_index, ignore_car)

    has_beta_s = "beta_semantic" in results
    beta_key = "beta_semantic" if has_beta_s else "beta"
    beta = composited_beta(results, beta_key, detach_samples=detach_beta)

    ce = _masked_ce(results["semantic_logits"], targets, mask)
    loss_dict = {"coarse_semantic": lambda_s * jnp.mean(ce / (2.0 * beta**2))}
    if has_beta_s:
        loss_dict["coarse_semantic_logbeta"] = lambda_s * (
            (3.0 + jnp.mean(jnp.log(beta))) / 2.0
        )
    return sum(loss_dict.values()), loss_dict


def semantic_car_reg_loss(
    results,
    targets,
    ignore_mask=None,
    lambda_c: float = 0.1,
    car_label: int = 4,
):
    """Transient regularisation Lt: push composited uncertainty to 1 at rays
    whose GT label is 'car' (ref: loss.py:117-157 SemanticCarRegLoss — the
    paper's contribution). Uses a count-safe masked mean (the reference
    produces NaN when a batch has no car rays; we return 0 instead)."""
    targets = targets.reshape(-1)
    uncertainty = jnp.sum(
        results["weights"][..., None] * results["beta"], axis=-2
    )[:, 0]
    car_mask = (targets == car_label).astype(jnp.float32)
    if ignore_mask is not None:
        car_mask = car_mask * ignore_mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(car_mask), 1.0)
    mse_at_cars = jnp.sum(car_mask * (uncertainty - 1.0) ** 2) / count
    loss_dict = {"coarse_car_reg_loss": lambda_c * mse_at_cars}
    return sum(loss_dict.values()), loss_dict
