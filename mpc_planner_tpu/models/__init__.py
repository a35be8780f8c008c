from mpc_planner_tpu.models.dynamics import (
    DynamicsModel,
    SecondOrderUnicycleModel,
    PointMassModel,
    ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelCurvatureAware,
    ContouringSecondOrderUnicycleModelWithSlack,
    BicycleModel2ndOrder,
    BicycleModel2ndOrderCurvatureAware,
)

__all__ = [
    "DynamicsModel",
    "SecondOrderUnicycleModel",
    "PointMassModel",
    "ContouringSecondOrderUnicycleModel",
    "ContouringSecondOrderUnicycleModelCurvatureAware",
    "ContouringSecondOrderUnicycleModelWithSlack",
    "BicycleModel2ndOrder",
    "BicycleModel2ndOrderCurvatureAware",
]
