from datalakes_and_data_integration_spark.cli import main

raise SystemExit(main())
