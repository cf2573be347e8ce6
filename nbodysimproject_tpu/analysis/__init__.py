from .stability import (StabilityAnalyzer, analyze_system,
                        analyze_system_jit, analyze_batch_jit)
from .batch import (BatchStabilityAnalyzer, stack_sims, analyze_population,
                    ic_feature_frame)

__all__ = ["StabilityAnalyzer", "analyze_system", "analyze_system_jit",
           "analyze_batch_jit", "BatchStabilityAnalyzer", "stack_sims", "analyze_population",
           "ic_feature_frame"]
