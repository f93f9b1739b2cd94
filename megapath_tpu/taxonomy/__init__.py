from megapath_tpu.taxonomy.taxdb import TaxDB, remove_version, get_accession  # noqa: F401
from megapath_tpu.taxonomy.report import KrakenReport  # noqa: F401
