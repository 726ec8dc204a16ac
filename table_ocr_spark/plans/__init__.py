"""Job plans: the end-to-end extraction pipeline with checkpoint-resume."""
