"""Control-pulse parameterizations (reference src/Controls/)."""

from .base import (
    Control,
    control_tables,
    control_tables_at,
    total_control_parameters,
    control_vector_slice,
    local_control_index,
    as_control_tuple,
    taylor_coefficients,
    eval_p,
    eval_q,
    eval_p_derivative,
    eval_q_derivative,
    eval_grad_p_derivative,
    eval_grad_q_derivative,
)
from .analytic import (
    SinCosControl,
    SinControl,
    CosControl,
    SquaredAmpCosControl,
    SingleSymCosControl,
    ZeroControl,
    GRAPEControl,
    GeneralGRAPEControl,
)
from .bspline import BSpline2Control
from .carrier import CarrierControl
from .deboor import GeneralBSplineControl, FortranBSplineControl
from .hermite import HermiteControl, HermiteCarrierControl


def BSplineControl(tf, D1, omega):
    """Legacy B-spline-times-carrier control (reference ``BSplineControl`` /
    ``bcarrier2``, src/Controls/bspline_control.jl:280-345).

    The reference's legacy implementation supports time derivatives only to
    order 1 (bspline_control.jl:347-357); here it is realized as
    ``CarrierControl(BSpline2Control(D1, tf), omega)``, which the reference
    itself declares as the successor ("Now I am just going to use Bsplines
    with the CarrierControl interface", bspline_control.jl:272-278) and which
    supports every derivative order. pcof layout: one (2*D1) B-spline block
    per carrier frequency.
    """
    return CarrierControl(BSpline2Control(D1, tf), omega)


__all__ = [
    "Control",
    "control_tables",
    "control_tables_at",
    "total_control_parameters",
    "control_vector_slice",
    "local_control_index",
    "as_control_tuple",
    "taylor_coefficients",
    "eval_p",
    "eval_q",
    "eval_p_derivative",
    "eval_q_derivative",
    "eval_grad_p_derivative",
    "eval_grad_q_derivative",
    "SinCosControl",
    "SinControl",
    "CosControl",
    "SquaredAmpCosControl",
    "SingleSymCosControl",
    "ZeroControl",
    "GRAPEControl",
    "GeneralGRAPEControl",
    "BSpline2Control",
    "BSplineControl",
    "CarrierControl",
    "GeneralBSplineControl",
    "FortranBSplineControl",
    "HermiteControl",
    "HermiteCarrierControl",
]
