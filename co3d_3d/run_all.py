"""Eval sweep generator: prints eval commands for the {model x feature x
seed} grid (reference co3d_3d/run_all.py:1-13)."""

MODELS = ["resnet14", "resnet18", "resnet34"]
FEATURES = ["feature_one", "feature_coord", "feature_density", "feature_sh"]
SEEDS = [777, 778, 779]

for model in MODELS:
    for feature in FEATURES:
        for seed in SEEDS:
            run = f"{model}-{feature}-{seed}"
            print(
                "python -m co3d_3d.eval "
                f"--ginc co3d_3d/configs/co3d_cls.gin "
                f"--ginc co3d_3d/configs/{feature}.gin "
                f"--ginc co3d_3d/configs/{model}.gin "
                f"--load_path experiments/{run}/best.ckpt "
                f"--training_module ClassificationTraining --tag {run}"
            )
