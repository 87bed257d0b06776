from lakehouse_workshop_spark.models.bgnbd import BetaGeoModel
from lakehouse_workshop_spark.models.gammagamma import GammaGammaModel

__all__ = ["BetaGeoModel", "GammaGammaModel"]
