"""Flow-matching transport: paths, losses, ODE/SDE samplers.

Reference: `/root/reference/dimsum/transport/__init__.py:5-69`
(create_transport with per-path eps defaults).
"""

from __future__ import annotations

from dimsum_tpu.transport.path import (  # noqa: F401
    GVPCPlan,
    ICPlan,
    VPCPlan,
    dct_blur,
    expand_t_like_x,
)
from dimsum_tpu.transport.transport import (  # noqa: F401
    ModelType,
    PathType,
    Sampler,
    Transport,
    WeightType,
    mean_flat,
)


def create_transport(
    path_type: str = "Linear",
    prediction: str = "velocity",
    loss_weight=None,
    train_eps=None,
    sample_eps=None,
    path_args=None,
    t_sample_mode: str = "uniform",
) -> Transport:
    path_args = path_args or {}

    if prediction == "noise":
        model_type = ModelType.NOISE
    elif prediction == "score":
        model_type = ModelType.SCORE
    else:
        model_type = ModelType.VELOCITY

    if loss_weight == "velocity":
        loss_type = WeightType.VELOCITY
    elif loss_weight == "likelihood":
        loss_type = WeightType.LIKELIHOOD
    else:
        loss_type = WeightType.NONE

    path_choice = {
        "Linear": (PathType.LINEAR, ICPlan),
        "GVP": (PathType.GVP, GVPCPlan),
        "VP": (PathType.VP, VPCPlan),
    }
    ptype, plan_cls = path_choice[path_type]

    # eps defaults mirror the reference (incl. its `train_eps is None` quirk
    # for the sample_eps default)
    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif ptype in (PathType.GVP, PathType.LINEAR) \
            and model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:
        train_eps = 0.0 if train_eps is None else train_eps
        sample_eps = 0.0 if sample_eps is None else sample_eps

    return Transport(
        model_type=model_type,
        path_type=ptype,
        loss_type=loss_type,
        train_eps=train_eps,
        sample_eps=sample_eps,
        path_sampler=plan_cls(**path_args),
        t_sample_mode=t_sample_mode,
    )
