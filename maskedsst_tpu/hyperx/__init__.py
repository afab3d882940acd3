"""DeepHyperX-equivalent benchmark subsystem (reference DeepHyperX/): a
standalone HSI classification benchmark with 13 baseline models, classic
scene datasets, sliding-window full-scene inference and a CLI runner."""
