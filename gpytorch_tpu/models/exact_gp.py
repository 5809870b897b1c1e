"""ExactGP (reference: gpytorch/models/exact_gp.py:23).

Train/eval/prior mode dispatch in ``__call__`` (reference :265-333); at test time the joint
train+test prior is formed lazily and only the needed blocks are evaluated
(``_get_test_prior_mean_and_covariances``, reference :355-429 — K(train,train) is never
rebuilt because LazyEvaluatedKernelOperator slicing slices the inputs).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from .. import settings
from ..distributions import MultitaskMultivariateNormal, MultivariateNormal
from ..likelihoods.gaussian_likelihood import _GaussianLikelihoodBase
from ..utils.warnings import GPInputWarning
from .exact_prediction_strategies import prediction_strategy
from .gp import GP


class ExactGP(GP):
    def __init__(self, train_inputs, train_targets, likelihood):
        super().__init__()
        if train_inputs is not None and not isinstance(train_inputs, (list, tuple)):
            train_inputs = (train_inputs,)
        if train_inputs is not None:
            train_inputs = tuple(self._reshape_input(jnp.asarray(ti)) for ti in train_inputs)
            train_targets = jnp.asarray(train_targets)
        elif train_targets is not None:
            raise RuntimeError("train_targets without train_inputs")
        self.train_inputs = train_inputs
        self.train_targets = train_targets
        self.likelihood = likelihood

    @staticmethod
    def _reshape_input(x):
        return x[..., None] if x.ndim == 1 else x

    # -- train data management (reference :113-150) -----------------------------------------
    def set_train_data(self, inputs=None, targets=None, strict: bool = True):
        if inputs is not None:
            if not isinstance(inputs, (list, tuple)):
                inputs = (inputs,)
            inputs = tuple(self._reshape_input(jnp.asarray(i)) for i in inputs)
            if strict and self.train_inputs is not None:
                for old, new in zip(self.train_inputs, inputs):
                    if old.shape != new.shape or old.dtype != new.dtype:
                        raise RuntimeError("Cannot modify shape/dtype of train inputs under strict=True")
            self.train_inputs = inputs
        if targets is not None:
            targets = jnp.asarray(targets)
            if strict and self.train_targets is not None:
                if targets.shape != self.train_targets.shape or targets.dtype != self.train_targets.dtype:
                    raise RuntimeError("Cannot modify shape/dtype of train targets under strict=True")
            self.train_targets = targets
        self.clear_caches()

    # -- fantasy models (reference :151-263) --------------------------------------------------
    def get_fantasy_model(self, inputs, targets, **kwargs):
        """Condition on new observations without refitting (reference :151-263).

        If this model has an active prediction strategy (it has been evaluated), the new
        model's caches are produced by the strategy's rank-m Schur update
        (exact_prediction_strategies.get_fantasy_strategy) rather than recomputed from
        scratch against the (n+m)-sized joint system."""
        if self.train_inputs is None:
            raise RuntimeError("Cannot get a fantasy model without training data")
        if not isinstance(inputs, (list, tuple)):
            inputs = (inputs,)
        inputs = tuple(self._reshape_input(jnp.asarray(i)) for i in inputs)
        targets = jnp.asarray(targets)
        full_inputs = tuple(
            jnp.concatenate([ti, fi], axis=-2) for ti, fi in zip(self.train_inputs, inputs)
        )
        # Multitask targets carry a trailing task dim: concatenate new observations along
        # the data dim (-2), matching reference exact_gp.py:183-186 (data_dim_start)
        old_strategy = self._cache.get("prediction_strategy")
        if old_strategy is not None:
            multitask = isinstance(old_strategy.train_prior_dist, MultitaskMultivariateNormal)
        else:
            multitask = isinstance(self._get_train_prior_distribution(), MultitaskMultivariateNormal)
        data_axis = -2 if multitask else -1
        full_targets = jnp.concatenate([self.train_targets, targets], axis=data_axis)
        # `noise` is a likelihood concern (fixed-noise models supply the new observations'
        # noise), never a forward() kwarg (reference exact_gp.py:229-252)
        fantasy_kwargs = {"noise": kwargs.pop("noise")} if "noise" in kwargs else {}
        new_model = self.deepcopy()
        new_model.train_inputs = full_inputs
        new_model.train_targets = full_targets
        new_model.clear_caches()
        if fantasy_kwargs and hasattr(self.likelihood, "get_fantasy_likelihood"):
            new_model.likelihood = self.likelihood.get_fantasy_likelihood(**fantasy_kwargs)
        if old_strategy is not None:
            full_output = self.forward(*full_inputs, **kwargs)
            new_strategy = old_strategy.get_fantasy_strategy(
                inputs, targets, full_inputs, full_targets, full_output, **{**kwargs, **fantasy_kwargs}
            )
            new_model._cache["prediction_strategy"] = new_strategy
        return new_model

    # -- prior helpers (reference :335-429) ----------------------------------------------------
    def _get_train_prior_distribution(self) -> MultivariateNormal:
        return self.forward(*self.train_inputs)

    # -- call protocol (reference :265-333) -----------------------------------------------------
    def __call__(self, *args, **kwargs):
        train_inputs = self.train_inputs if self.train_inputs is not None else ()
        inputs = tuple(self._reshape_input(jnp.asarray(a)) for a in args)

        # prior mode
        if settings.prior_mode.on() or self.train_inputs is None or self.train_targets is None:
            return self.forward(*inputs, **kwargs)

        if self.training:
            if settings.debug.on():
                if len(inputs) == len(train_inputs):
                    for ti, i in zip(train_inputs, inputs):
                        if ti.shape != i.shape:
                            raise RuntimeError("You must train on the training inputs!")
            return self.forward(*inputs, **kwargs)

        # posterior mode
        if settings.debug.on():
            if len(inputs) == len(train_inputs) and all(
                ti.shape == i.shape and (ti is i or bool(jnp.all(ti == i))) for ti, i in zip(train_inputs, inputs)
            ):
                warnings.warn(
                    "The input matches the stored training data. Did you forget to call model.train()?",
                    GPInputWarning,
                )

        strategy = self._cache.get("prediction_strategy")
        if strategy is None:
            train_prior_dist = self.forward(*train_inputs, **kwargs)
            strategy = prediction_strategy(train_inputs, train_prior_dist, self.train_targets, self.likelihood)
            self._cache["prediction_strategy"] = strategy

        # joint prior over [train, test] (reference :355-429)
        full_inputs = tuple(
            jnp.concatenate([jnp.broadcast_to(ti, jnp.broadcast_shapes(ti.shape[:-2], i.shape[:-2]) + ti.shape[-2:]),
                             jnp.broadcast_to(i, jnp.broadcast_shapes(ti.shape[:-2], i.shape[:-2]) + i.shape[-2:])], axis=-2)
            for ti, i in zip(train_inputs, inputs)
        )
        full_output = self.forward(*full_inputs, **kwargs)
        if settings.debug.on() and not isinstance(full_output, MultivariateNormal):
            raise RuntimeError("ExactGP.forward must return a MultivariateNormal")

        with settings.cg_tolerance(settings.eval_cg_tolerance.value()):
            joint_mean = full_output.loc
            joint_covar = full_output.lazy_covariance_matrix
            pred_mean, pred_covar = strategy.exact_prediction(joint_mean, joint_covar)
        if isinstance(full_output, MultitaskMultivariateNormal):
            t = full_output.num_tasks
            task_mean = pred_mean.reshape(pred_mean.shape[:-1] + (-1, t)) if full_output.interleaved else jnp.swapaxes(
                pred_mean.reshape(pred_mean.shape[:-1] + (t, -1)), -1, -2
            )
            return MultitaskMultivariateNormal(task_mean, pred_covar, interleaved=full_output.interleaved)
        return MultivariateNormal(pred_mean, pred_covar)

    def clear_caches(self):
        super().clear_caches()

    def local_load_samples(self, *args, **kwargs):
        raise NotImplementedError
