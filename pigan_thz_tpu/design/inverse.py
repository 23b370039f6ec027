"""Inverse design API: spectrum -> structural parameters.

The user-facing counterpart of the reference's workflow (generator inference
+ forward-model verification), packaged as one object, plus a capability the
reference cannot express: **gradient refinement through the differentiable
surrogate** — starting from the generator's prediction, run Adam directly on
the normalized parameters to minimize the spectrum-match loss through the
frozen forward model (plus the physics terms), entirely inside one
`lax.scan`-compiled program.

    designer = InverseDesigner(g, f, g_vars, f_vars, ds)
    out = designer.design(spectrum)             # G prediction + F check
    out = designer.design(spectrum, refine_steps=200)   # + surrogate-gradient
                                                        # refinement
    mean, std = designer.uncertainty(spectrum)  # MC-dropout spread

Batched over spectra; jit-compiled once per (batch, refine_steps) shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.dataset import ThzDataset, denormalize_params
from ..ops import losses as L


class DesignResult(NamedTuple):
    params: jax.Array          # (B, 4) physical units
    params_norm: jax.Array     # (B, 4) in [-1, 1]
    pred_spectrum: jax.Array   # (B, S) surrogate spectrum of the design
    spectrum_mse: jax.Array    # (B,) match quality vs the target
    pred_metrics: jax.Array    # (B, 8) surrogate metric head (normalized)


class InverseDesigner:
    def __init__(
        self,
        generator,
        forward_model,
        g_variables,
        f_variables,
        ds: ThzDataset,
        refine_lr: float = 0.02,
        maxwell_w: float = 0.1,
    ):
        self.ds = ds
        g_vars = g_variables
        f_vars = f_variables
        lo, hi = ds.param_lo, ds.param_hi

        def fwd(pn):
            out = forward_model.apply(f_vars, pn, train=False)
            return out[0], out[1]

        def predict(spectra):
            return generator.apply(g_vars, spectra, train=False)

        @partial(jax.jit, static_argnames=("refine_steps",))
        def design(spectra, refine_steps: int = 0):
            pn = predict(spectra)
            if refine_steps > 0:
                tx = optax.adam(refine_lr)

                def loss_fn(p):
                    # optimizing in atanh-space already confines the refined
                    # params to (-1, 1); no separate range penalty is needed
                    spec, _ = fwd(jnp.tanh(p))
                    return (
                        L.mse(spec, spectra)
                        + maxwell_w * L.maxwell_smoothness_loss(spec)
                    )

                # optimize in atanh-space so tanh keeps iterates in-domain
                z0 = jnp.arctanh(jnp.clip(pn, -0.999, 0.999))

                def body(carry, _):
                    z, opt = carry
                    loss, grads = jax.value_and_grad(loss_fn)(z)
                    updates, opt = tx.update(grads, opt, z)
                    return (optax.apply_updates(z, updates), opt), loss

                (z, _), _ = jax.lax.scan(
                    body, (z0, tx.init(z0)), None, length=refine_steps
                )
                pn = jnp.tanh(z)
            spec, met = fwd(pn)
            mse_per = jnp.mean((spec - spectra) ** 2, axis=-1)
            return DesignResult(
                params=denormalize_params(pn, lo, hi),
                params_norm=pn,
                pred_spectrum=spec,
                spectrum_mse=mse_per,
                pred_metrics=met,
            )

        def uncertainty(spectra, key, num_samples: int = 64, params_norm=None):
            from ..models.forward_model import mc_dropout_predict

            # evaluate the dropout spread AT the design point being reported:
            # pass the refined params_norm when refinement was used, else the
            # raw generator prediction
            pn = predict(spectra) if params_norm is None else params_norm
            return mc_dropout_predict(
                forward_model, f_vars, pn, key, num_samples=num_samples
            )

        self._design = design
        self._uncertainty = uncertainty

    def design(self, spectra: jax.Array, refine_steps: int = 0) -> DesignResult:
        single = spectra.ndim == 1
        if single:
            spectra = spectra[None, :]
        out = self._design(spectra, refine_steps=refine_steps)
        if single:
            out = jax.tree.map(lambda x: x[0], out)
        return out

    def uncertainty(
        self, spectra: jax.Array, key: jax.Array, num_samples: int = 64,
        params_norm: jax.Array | None = None,
    ):
        """MC-dropout spread of the surrogate at a design point.  By default
        the point is the raw generator prediction for `spectra`; pass
        `params_norm` (e.g. ``design(...).params_norm``) to evaluate the
        spread at a refined design instead."""
        if spectra.ndim == 1:
            spectra = spectra[None, :]
        if params_norm is not None and params_norm.ndim == 1:
            params_norm = params_norm[None, :]
        return self._uncertainty(spectra, key, num_samples, params_norm)
