from .io import (  # noqa: F401
    read_seed_list,
    read_table,
    write_corpus_json,
    write_table,
)
