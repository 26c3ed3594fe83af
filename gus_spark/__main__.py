from gus_spark.cli import main

raise SystemExit(main())
