from .cleansing import cleanse_turns, dedup_key  # noqa: F401
