from .ic_generator import InitialConditionGenerator, GeneratorConfig
from .specialized import SpecializedGenerators
from .pipeline import MLTrainingPipeline

__all__ = ["InitialConditionGenerator", "GeneratorConfig",
           "SpecializedGenerators", "MLTrainingPipeline"]
