from data_lakehouse_platform_spark.plans.explain import PlanAudit, audit_plan
from data_lakehouse_platform_spark.plans.medallion import MedallionPipeline

__all__ = ["PlanAudit", "audit_plan", "MedallionPipeline"]
