from polypolish_tpu.models.polisher import PolisherModel

__all__ = ["PolisherModel"]
