"""VarNet train/test entry point (reference traintest_scripts/varnet/train_test_varnet.py)."""

from cinemri_tpu.cli.common import train_test_main


def run_main(argv=None):
    return train_test_main("varnet", argv)


if __name__ == "__main__":
    run_main()
