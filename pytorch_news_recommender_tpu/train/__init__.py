"""Training/eval engine: jitted train step, impression-level metrics,
Orbax checkpointing, and the MIND submission writer."""
