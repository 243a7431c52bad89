from .decode import convert_entity, decode_documents, ENTITY_SCHEMA  # noqa: F401
