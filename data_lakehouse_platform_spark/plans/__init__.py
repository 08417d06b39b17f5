from data_lakehouse_platform_spark.plans.explain import (
    PlanAudit,
    audit_plan,
    canonical_plan,
    plan_fingerprint,
)
from data_lakehouse_platform_spark.plans.medallion import MedallionPipeline

__all__ = [
    "PlanAudit",
    "audit_plan",
    "canonical_plan",
    "plan_fingerprint",
    "MedallionPipeline",
]
