from .preintegration import (  # noqa: F401
    ImuCalib, preintegrate, corrected_delta, predict_state, inertial_residual,
    GRAVITY,
)
