"""DeepHyperX-equivalent benchmark subsystem (reference DeepHyperX/): a
standalone HSI classification benchmark with 12 baseline models, classic
scene datasets, sliding-window full-scene inference and a CLI runner."""
