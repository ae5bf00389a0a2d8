from .rest import (  # noqa: F401
    RestClient,
    cursor_paginate,
    offset_paginate,
    chunked_ids,
    distributed_fetch,
)
