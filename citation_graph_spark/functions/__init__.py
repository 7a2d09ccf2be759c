from citation_graph_spark.functions.normalize import (  # noqa: F401
    ascii_fold,
    ascii_fold_py,
    normalize_title,
    normalize_title_py,
    titles_resemble,
    titles_resemble_py,
)
from citation_graph_spark.functions.ids import (  # noqa: F401
    ID_TYPES,
    MISSING_TITLE,
    create_id,
    normalize_external_id,
    parse_id_string,
    priority_id,
)
from citation_graph_spark.functions.authors import (  # noqa: F401
    authors_str,
    split_author_name,
)
from citation_graph_spark.functions.viz import (  # noqa: F401
    hsv_to_hex,
    node_size,
    year_color,
)
