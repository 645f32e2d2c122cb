from spark_ifs_spark.cli import main

raise SystemExit(main())
