-- Creation of objects started.
go

CREATE TABLE "app1"."t_parent" (
    "pk" integer NOT NULL,
    "name" varchar(40) NOT NULL,
    PRIMARY KEY ("pk")
) IN "user_dsp1"
go

CREATE TABLE "app1"."t_child" (
    "pk" integer NOT NULL,
    "parent_pk" integer NOT NULL,
    "qty" numeric(12,2) NULL DEFAULT 0
) IN "user_dsp2"
go

ALTER TABLE "app1"."t_child"
    ADD NOT NULL FOREIGN KEY "fk_parent" ("parent_pk")
    REFERENCES "app1"."t_parent" ("pk")
go

CREATE TABLE "app1"."t_rlv" (
    "id" integer NOT NULL,
    "v" varchar(16) NULL
) IN "user_dsp1" ENABLE RLV STORE
go

CREATE LF INDEX "idx_lf_child" ON "app1"."t_child" ("qty")
go

CREATE HG INDEX "idx_hg_child" ON "app1"."t_child" ("pk")
go

CREATE HNG INDEX "idx_hng_wide" ON "app2"."t_wide" ("k")
go

COMMENT TO PRESERVE FORMAT ON PROCEDURE "app1"."p_ext_udf"
create procedure "app1"."p_ext_udf"( in arg1 integer )
EXTERNAL NAME 'libudf.so'
go

COMMENT TO PRESERVE FORMAT ON PROCEDURE "app1"."p_app_calc"
create procedure "app1"."p_app_calc"()
begin
    select 1
end
go

COMMENT TO PRESERVE FORMAT ON PROCEDURE "app1"."p_wrap"
create procedure "app1"."p_wrap"()
begin
    -- helper body comment
    SET OPTION "PUBLIC"."CORE_Options2" = 'ON'
end
go

CREATE TEXT CONFIGURATION "SYS"."default_char" FROM "SYS"."default_char"
    STOPLIST ''
go

CREATE DOMAIN "money_t" numeric(18,4) AS USER "app1"
go

GRANT CONNECT TO "app_user" IDENTIFIED BY ENCRYPTED
password values '\x61\x62\x63\x64'
go

GRANT CONNECT TO "analyst2"
go

GRANT CONNECT TO DBA IDENTIFIED BY ENCRYPTED
password values '\x65\x66\x67\x68'
go

SET OPTION "PUBLIC"."Append_Load" = 'ON'
go

SET OPTION "PUBLIC"."CORE_Options1" = 'ON'
go

SET OPTION "PUBLIC"."Temp_Extract_Directory" = '/tmp/ext'
go

ALTER LOGIN POLICY root
max_connections = 50
locked = OFF
go

CREATE SERVER "rsrv_hana" CLASS 'hanaodbc' USING 'Driver=libodbcHDB.so;host1:30015'
go

CREATE EXISTING TABLE "app1"."t_proxy" AT 'rsrv_hana..db.tab'
go

GRANT ROLE SYS_AUTH_DBA_ROLE TO "app1"
go

CREATE DBSPACE "user_dsp3" USING FILE "f3" '/iq/f3.iq' SIZE 1024
go

-- Creation of objects completed.
