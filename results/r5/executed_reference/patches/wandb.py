"""No-op wandb stub (no network egress in this image)."""


class _Run:
    def log(self, *a, **k):
        pass

    def finish(self):
        pass


def init(*a, **k):
    return _Run()
