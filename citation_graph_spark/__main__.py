import sys

from citation_graph_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
