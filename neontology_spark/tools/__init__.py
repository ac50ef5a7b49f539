from .dump import dump_nodes, dump_relationships, node_link_data
from .import_files import import_json_files, import_md_files, import_yaml_files
from .import_records import ImportError_, classify_records, import_records

__all__ = [
    "dump_nodes",
    "dump_relationships",
    "node_link_data",
    "import_json_files",
    "import_md_files",
    "import_yaml_files",
    "ImportError_",
    "classify_records",
    "import_records",
]
